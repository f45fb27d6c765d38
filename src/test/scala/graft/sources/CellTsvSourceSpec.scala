package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.AreaPipeline

/** The DataSource V2 connector: schema, round-trip fidelity, and —
  * the point — page-predicate pushdown pruning input partitions at
  * file-listing time.
  */
class CellTsvSourceSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val Fmt = classOf[CellTsvSource].getName

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-cellsv-").toString
    CellTsvSource.write(dir, Seq(
      (0L, 1, 0, 0L, Seq("K o d e", "NAMA PROVINSI", "", "", "", "", "")),
      (0L, 1, 1, 1L, Seq("1", "2", "3", "4", "5", "6", "7")),
      (0L, 1, 2, 2L, Seq("11", "Aceh", "", "", "", "", "")),
      (1L, 2, 0, 3L, Seq("K o d e", "NAMA PROVINSI", "", "", "", "", "")),
      (1L, 2, 1, 4L, Seq("1", "2", "3", "4", "5", "6", "7")),
      (1L, 2, 2, 5L, Seq("12", "Sumatera Utara", "", "", "", "", "")),
      (2L, 5, 0, 6L, Seq("K o d e", "NAMA PROVINSI", "", "", "", "", "")),
      (2L, 5, 1, 7L, Seq("1", "2", "3", "4", "5", "6", "7")),
      (2L, 5, 2, 8L, Seq("13", "Sumatera Barat", "", "", "", "", ""))))
    dir
  }

  test("reads the format with the declared schema and full fidelity") {
    val df = spark.read.format(Fmt).option("path", writeFixture()).load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("table_id", "page", "row_idx", "seq", "cells"))
    assert(df.count() == 9)
    val r = df.filter($"seq" === 2L).collect()(0)
    assert(r.getSeq[String](r.fieldIndex("cells")).take(2).toList ==
      List("11", "Aceh"))
  }

  test("page predicates prune input partitions at file-listing time") {
    val dir = writeFixture()
    val all = spark.read.format(Fmt).option("path", dir).load()
    def partitionsFor(df: org.apache.spark.sql.DataFrame): Int =
      df.rdd.getNumPartitions
    assert(partitionsFor(all) == 3) // one per page file
    val pruned = all.filter($"page".isin(1, 2))
    assert(partitionsFor(pruned) == 2) // page=5 file never planned
    assert(pruned.select("table_id").distinct().count() == 2)
    val range = all.filter($"page" <= 2)
    assert(partitionsFor(range) == 2)
  }

  test("DSv2 write round-trips: two-phase commit, page layout preserved") {
    val src = writeFixture()
    val dst = Files.createTempDirectory("graft-cellsv-w-").toString
    val df = spark.read.format(Fmt).option("path", src).load()
    df.write.format(Fmt).option("path", dst).mode("append").save()
    // no stray temp files after commit
    val names = Files.list(java.nio.file.Paths.get(dst)).iterator()
    val files = Iterator.continually(names).takeWhile(_ => names.hasNext)
      .map(_.next().getFileName.toString).toList
    assert(files.nonEmpty && files.forall(_.endsWith(".cells")), files)
    assert(!files.exists(_.endsWith(".tmp")), files)
    val back = spark.read.format(Fmt).option("path", dst).load()
    assert(back.count() == df.count())
    assert(back.orderBy("seq").collect().map(_.toSeq).toSeq ==
      df.orderBy("seq").collect().map(_.toSeq).toSeq)
    // page pruning still works on writer-emitted file names
    assert(back.filter($"page" === 5).rdd.getNumPartitions >= 1)
    assert(back.filter($"page" === 5).count() == 3)
  }

  test("DSv2 overwrite mode truncates prior visible files") {
    val src = writeFixture()
    val dst = Files.createTempDirectory("graft-cellsv-ow-").toString
    val df = spark.read.format(Fmt).option("path", src).load()
    df.write.format(Fmt).option("path", dst).mode("append").save()
    // overwrite with only page 1 rows: pages 2/5 must disappear
    df.filter($"page" === 1)
      .write.format(Fmt).option("path", dst).mode("overwrite").save()
    val back = spark.read.format(Fmt).option("path", dst).load()
    assert(back.count() == 3)
    assert(back.select("page").distinct().as[Int].collect().toSeq == Seq(1))
  }

  test("cells with newlines, CRs, tabs, and backslashes round-trip") {
    // raw \n in cell text is routine pre-cleanse ("1\nBakongan") — an
    // unescaped newline would split one record across physical lines
    val gnarly = Seq(
      (0L, 1, 0, 0L, Seq("1\nBakongan", "a\rb", "c\r\nd")),
      (0L, 1, 1, 1L, Seq("tab\there", "back\\slash", "\\n literal")),
      (0L, 1, 2, 2L, Seq("", "trailing\n")),
      // the SOH cell separator itself, plus lookalikes that must NOT
      // be confused with its \x01 escape: a raw SOH splitting a cell
      // would shift every later column
      (0L, 1, 3, 3L, Seq("so\u0001h", "\u0001", "literal \\x01", "a\\\u0001b")))
    val dir = Files.createTempDirectory("graft-cellsv-esc-").toString
    CellTsvSource.write(dir, gnarly)
    val direct = spark.read.format(Fmt).option("path", dir).load()
      .orderBy("seq").collect()
      .map(r => r.getSeq[String](r.fieldIndex("cells")).toList).toList
    assert(direct == gnarly.map(_._5.toList).toList)
    // and through the DSv2 writer as well
    val dst = Files.createTempDirectory("graft-cellsv-esc-w-").toString
    spark.read.format(Fmt).option("path", dir).load()
      .write.format(Fmt).option("path", dst).mode("append").save()
    val back = spark.read.format(Fmt).option("path", dst).load()
      .orderBy("seq").collect()
      .map(r => r.getSeq[String](r.fieldIndex("cells")).toList).toList
    assert(back == gnarly.map(_._5.toList).toList)
  }

  test("empty cells arrays round-trip (width is load-bearing)") {
    val dir = Files.createTempDirectory("graft-cellsv-empty-").toString
    CellTsvSource.write(dir, Seq(
      (0L, 1, 0, 0L, Seq.empty[String]),
      (0L, 1, 1, 1L, Seq("")),
      (0L, 1, 2, 2L, Seq("", ""))))
    val widths = spark.read.format(Fmt).option("path", dir).load()
      .orderBy("seq").select(size($"cells")).as[Int].collect().toSeq
    assert(widths == Seq(0, 1, 2))
  }

  test("page filters stay exact on mis-filed rows (pushdown = pruning only)") {
    // A hand-written page=1 file smuggling a page=7 row: the pushed
    // predicate prunes FILES, but the post-scan residual Filter must
    // still evaluate the row's actual page column. (The mis-filed row
    // is unreachable via page=7 — its file is pruned away — which is
    // the documented consequence of file-level pruning; silently
    // RETURNING it for page=1 would be a wrong answer, not a layout
    // quirk.)
    val dir = Files.createTempDirectory("graft-cellsv-stray-").toString
    val lines = Seq(
      s"0\t1\t0\t0\t${CellTsvSource.encodeCells(Seq("a", "b"))}",
      s"0\t7\t1\t1\t${CellTsvSource.encodeCells(Seq("stray", "row"))}")
    Files.write(java.nio.file.Paths.get(dir, "page=1.cells"),
      lines.mkString("\n").getBytes("UTF-8"))
    val df = spark.read.format(Fmt).option("path", dir).load()
    assert(df.count() == 2)
    assert(df.filter($"page" === 1).count() == 1)
    assert(df.filter($"page" === 1).select("cells").as[Seq[String]]
      .collect().head == Seq("a", "b"))
  }

  test("overwrite of an empty DataFrame into a fresh path commits cleanly") {
    val src = writeFixture()
    val dst = Files.createTempDirectory("graft-cellsv-fresh-").toString + "/sub"
    val df = spark.read.format(Fmt).option("path", src).load()
    df.filter($"page" === 999) // empty: no DataWriter ever runs
      .write.format(Fmt).option("path", dst).mode("overwrite").save()
    assert(spark.read.format(Fmt).option("path", dst).load().count() == 0)
  }

  test("the DSv2 scan feeds the real pipeline end-to-end") {
    val cells = spark.read.format(Fmt).option("path", writeFixture()).load()
      .filter($"page".isin(1, 5))
    val out = AreaPipeline.extract(cells)
      .select("code").as[String].collect().toSet
    assert(out == Set("11", "13")) // page 2's province pruned at source
  }
}
