package graft.ops

import graft.SparkSpec

/** Mirrors the reference's IslandExtractor tests
  * (`tests/test_extractors.py:491-710`).
  */
class IslandPipelineSpec extends SparkSpec {

  private def extractRows(grid: Seq[Seq[String]]): List[List[Any]] = {
    val cells = CellTables.ofGrid(spark, grid)
    IslandPipeline.extract(cells)
      .orderBy("seq").drop("seq").collect().map(_.toSeq.toList).toList
  }

  test("matches: island fixture accepted; area fixtures rejected") {
    assert(IslandPipeline.isIslandHeader(
      IslandPipeline.normHeaderRow(Fixtures.dfIsland.head)))
    assert(!IslandPipeline.isIslandHeader(
      IslandPipeline.normHeaderRow(Fixtures.dfArea.head)))
    assert(!IslandPipeline.isIslandHeader(
      IslandPipeline.normHeaderRow(Fixtures.dfAreaUnmatched.head)))
  }

  test("extract standard island table (test_extract)") {
    val expected = List(
      List("11.01.40001", "11.01", "03°19'03.44\" N 097°07'41.73\" E", 0, 0, "Pulau Batukapal"),
      List("11.01.40002", "11.01", "03°24'55.00\" N 097°04'21.00\" E", 0, 0, "Pulau Batutunggal"),
      List("11.01.40004", "11.01", "02°54'25.11\" N 097°26'18.51\" E", 0, 0, "Pulau Mangki"),
      List("11.03.40003", "11.03", "04°36'19.18\" N 098°01'02.04\" E", 0, 0, "Pulau Krueng Beukah"),
      List("11.03.40005", "11.03", "05°06'37.00\" N 097°37'35.00\" E", 1, 0, "Pulau Nebukserdang"),
      List("11.06.40007", "11.06", "05°47'34.72\" N 094°58'26.09\" E", 0, 1, "Pulau Bateeleblah"))
    assert(extractRows(Fixtures.dfIsland) == expected)
  }

  test("extract messy + regency-less (test_extract_messy_and_regencyless)") {
    val expected = List(
      List("12.00.40001", "", "01°22'40.00\" N 120°53'04.00\" E", 1, 1, "Pulau 1"),
      List("12.00.40002", "", "03°31'33.49\" N 125°39'37.53\" E", 0, 1, "Pulau 2"),
      List("12.01.40003", "12.01", "01°18'47.00\" N 124°30'46.00\" E", 0, 0, "Pulau 3"),
      List("12.01.40004", "12.01", "01°22'40.00\" N 120°53'04.00\" E", 0, 0, "Pulau 4"))
    assert(extractRows(Fixtures.dfIslandMessy) == expected)
  }

  test("empty / no header / header-only / invalid codes yield nothing") {
    assert(extractRows(Nil).isEmpty)
    assert(extractRows(Seq(
      Seq("NOT_ISLAND", "DATA"),
      Seq("11.01", "Something"))).isEmpty)
    assert(extractRows(Seq(Seq("Kode Pulau", "Nama", "Koordinat"))).isEmpty)
    assert(extractRows(Seq(
      Seq("Kode Pulau", "Nama"),
      Seq("INVALID", "Pulau Invalid"),
      Seq("11.01", "Not island code"),
      Seq("11.01.4000X", "Invalid char"))).isEmpty)
  }

  test("parent-from-code paths (test_extract_rows_parent_from_code_paths)") {
    val rows = extractRows(Seq(
      Seq("no", "kode pulau", "nama pulau", "koordinat", "berpenghuni", "terluar"),
      Seq("1", "12.01.40003", "Pulau A", "01°18'47.00\" U 124°30'46.00\" T", "0", "0"),
      Seq("2", "12.00.40001", "Pulau B", "03°31'33.49\" U 125°39'37.53\" T", "0", "1")))
    assert(rows.length == 2)
    assert(rows(0)(0) == "12.01.40003" && rows(0)(1) == "12.01")
    assert(rows(1)(0) == "12.00.40001" && rows(1)(1) == "")
  }

  test("name column keyword and fallback (test_extract_rows_find_name_col_keyword_and_fallback)") {
    val a = extractRows(Seq(
      Seq("no", "kode pulau", "nama pulau", "koordinat"),
      Seq("1", "12.01.40004", "Pulau X", "01°22'40.00\" U 120°53'04.00\" T")))
    assert(a.nonEmpty && a.head.last == "Pulau X")

    val b = extractRows(Seq(
      Seq("no", "kode pulau", "nama sebelah kode", "koordinat"),
      Seq("1", "12.01.40005", "Pulau Y", "01°22'40.00\" U 120°53'04.00\" T")))
    assert(b.nonEmpty && b.head.last == "Pulau Y")
  }

  test("name-equals-code rescue takes next-to-code column (both orderings)") {
    val c = extractRows(Seq(
      Seq("no", "kode pulau", "nama sebelah", "nama pulau", "koordinat"),
      Seq("1", "12.01.40003", "Pulau 3", "12.01.40003",
        "01°18'47.00\" U 124°30'46.00\" T")))
    assert(c.nonEmpty && c.head.head == "12.01.40003" && c.head.last == "Pulau 3")

    val d = extractRows(Seq(
      Seq("no", "kode pulau", "sebelah kode", "nama pulau", "koordinat"),
      Seq("1", "12.01.40003", "Pulau 3", "12.01.40003",
        "01°18'47.00\" U 124°30'46.00\" T")))
    assert(d.nonEmpty && d.head.head == "12.01.40003" && d.head.last == "Pulau 3")
    assert(d.head(2) == "01°18'47.00\" N 124°30'46.00\" E")
  }

  test("no kode column yields nothing (test_island_extract_rows_returns_empty_when_no_kode_column)") {
    val rows = extractRows(Seq(
      Seq("no", "identifikasi", "nama pulau", "koordinat"),
      Seq("1", "X123", "Pulau Q", "01°22'40.00\" U 120°53'04.00\" T")))
    assert(rows.isEmpty)
  }

  test("extract-and-persist row shape (test_extract_and_persist_csv)") {
    val rows = extractRows(Seq(
      Seq("header", "kode pulau", "nama", "koordinat", "status"),
      Seq("1", "12.01.40001", "Pulau X", "03°19'03.44\" U 097°07'41.73\" T", "BP")))
    assert(rows == List(List("12.01.40001", "12.01",
      "03°19'03.44\" N 097°07'41.73\" E", 1, 0, "Pulau X")))
  }

  test("inferColumns: left-most column wins the OR'd predicate (find_first parity)") {
    // the reference's find_first (extractors.py:219-234) scans columns
    // left-to-right with ONE OR'd predicate per target — "keterangan"
    // before "bp/tbp" resolves status to column 0, not to the
    // higher-signal keyword at column 1
    val cols = IslandPipeline.inferColumns(
      Seq("keterangan", "bp/tbp", "kode pulau", "nama", "koordinat"))
    assert(cols.status == 0)
    assert(cols.info == 0)
    assert(cols.code == 2 && cols.name == 3 && cols.coordinate == 4)
    // absent targets stay -1
    assert(IslandPipeline.inferColumns(Seq("a", "b")).code == -1)
  }
}
