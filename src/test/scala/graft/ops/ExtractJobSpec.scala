package graft.ops

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.config.EtlConfig
import graft.config.EtlConfig.{Config, DataConfig}
import scala.jdk.CollectionConverters._

/** IO-level behavior mirroring `tests/test_extractors.py:713-808`:
  * per-entity headered CSV files named `{output}.{suffix}.csv`,
  * header-only files for zero rows, CRLF + `""` quoting (the reference
  * goldens are byte-compared), zero-total failure.
  */
class ExtractJobSpec extends SparkSpec {

  private val config = Config(Map(
    "province" -> DataConfig(2, Seq("code", "name"), "province"),
    "regency" -> DataConfig(2, Seq("code", "province_code", "name"), "regency"),
    "district" -> DataConfig(2, Seq("code", "regency_code", "name"), "district"),
    "village" -> DataConfig(2, Seq("code", "district_code", "name"), "village"),
    "island" -> DataConfig(2,
      Seq("code", "regency_code", "coordinate", "is_populated",
        "is_outermost_small", "name"), "island")))

  private def tmpDir(): Path = Files.createTempDirectory("graft-spec-")

  private def readLines(p: Path): List[String] =
    Files.readAllLines(p).asScala.toList

  test("full run writes five files with reference naming + counts") {
    val dest = tmpDir()
    val cells = CellTables.ofGrids(spark,
      Seq(Fixtures.dfArea, Fixtures.dfIsland, Fixtures.dfAreaUnmatched))
    val result = ExtractJob.run(cells, dest.toString, "x", config, singleFile = true)
    assert(result.counts == Map("province" -> 1, "regency" -> 1,
      "district" -> 1, "village" -> 4, "island" -> 6))
    for (suffix <- Seq("province", "regency", "district", "village", "island"))
      assert(Files.exists(dest.resolve(s"x.$suffix.csv")), suffix)
    val provinceLines = readLines(dest.resolve("x.province.csv"))
    assert(provinceLines == List("code,name", "11,Aceh"))
  }

  test("island CSV bytes match Python csv.writer semantics (CRLF + doubled quotes)") {
    val dest = tmpDir()
    val cells = CellTables.ofGrid(spark, Seq(
      Seq("header", "kode pulau", "nama", "koordinat", "status"),
      Seq("1", "12.01.40001", "Pulau X",
        "03°19'03.44\" U 097°07'41.73\" T", "BP")))
    ExtractJob.run(cells, dest.toString, "sample", config, singleFile = true)
    val bytes = Files.readString(dest.resolve("sample.island.csv"))
    assert(bytes ==
      "code,regency_code,coordinate,is_populated,is_outermost_small,name\r\n" +
      "12.01.40001,12.01,\"03°19'03.44\"\" N 097°07'41.73\"\" E\",1,0,Pulau X\r\n")
  }

  test("empty-entity outputs are header-only files (test_extract_and_write_empty_result)") {
    val dest = tmpDir()
    // island-only input: the four area files must still exist, header-only
    val cells = CellTables.ofGrid(spark, Seq(
      Seq("header", "kode pulau", "nama", "koordinat", "status"),
      Seq("1", "12.01.40001", "Pulau X",
        "03°19'03.44\" U 097°07'41.73\" T", "BP")))
    ExtractJob.run(cells, dest.toString, "empty", config, singleFile = true)
    val lines = readLines(dest.resolve("empty.province.csv"))
    assert(lines == List("code,name"))
  }

  test("empty entity keeps the header in the DEFAULT partitioned layout too") {
    val dest = tmpDir()
    val cells = CellTables.ofGrid(spark, Seq(
      Seq("header", "kode pulau", "nama", "koordinat", "status"),
      Seq("1", "12.01.40001", "Pulau X",
        "03°19'03.44\" U 097°07'41.73\" T", "BP")))
    ExtractJob.run(cells, dest.toString, "mf", config) // singleFile = false
    val dir = dest.resolve("mf.province.csv.d")
    assert(Files.isDirectory(dir))
    val headers = Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".csv"))
      .flatMap(p => readLines(p).headOption)
    assert(headers.contains("code,name"), headers.toString)
  }

  test("zero extracted rows raises NoMatchingDataException (A2, cli.py:198-201)") {
    val dest = tmpDir()
    val cells = CellTables.ofGrid(spark, Fixtures.dfAreaUnmatched)
    intercept[ExtractJob.NoMatchingDataException] {
      ExtractJob.run(cells, dest.toString, "none", config, singleFile = true)
    }
    // writers opened before extraction: header-only files still exist
    assert(readLines(dest.resolve("none.village.csv")) ==
      List("code,district_code,name"))
  }

  test("default (scale-safe) layout writes partitioned dirs, order kept") {
    val dest = tmpDir()
    val cells = CellTables.ofGrid(spark, Fixtures.dfIsland)
    val result = ExtractJob.run(cells, dest.toString, "part", config)
    assert(result.counts("island") == 6)
    val dir = dest.resolve("part.island.csv.d")
    assert(Files.isDirectory(dir))
    // global document order holds across range-partitioned part files
    // (part file names sort in range order)
    val codes = Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".csv")).sortBy(_.toString)
      .flatMap(p => readLines(p).drop(1))
      .map(_.split(",")(0))
    assert(codes == List("11.01.40001", "11.01.40002", "11.01.40004",
      "11.03.40003", "11.03.40005", "11.06.40007"))
  }

  test("document order is preserved in written CSVs (W1)") {
    val dest = tmpDir()
    val cells = CellTables.ofGrid(spark, Fixtures.dfIsland)
    ExtractJob.run(cells, dest.toString, "ord", config, singleFile = true)
    val lines = readLines(dest.resolve("ord.island.csv"))
    val codes = lines.drop(1).map(_.split(",")(0))
    assert(codes == List("11.01.40001", "11.01.40002", "11.01.40004",
      "11.03.40003", "11.03.40005", "11.06.40007"))
  }
}
