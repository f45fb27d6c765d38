package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{CellTables, Fixtures, TextDedup}

/** Interchange-format coverage beyond parquet: the cell-table and
  * documents schemas round-trip through ORC (Spark-native columnar
  * alternative) and JSON-lines with no loss — the engine is not
  * parquet-bound.
  */
class InterchangeSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("cell tables round-trip through ORC losslessly") {
    val dir = Files.createTempDirectory("graft-orc-").toString
    val cells = CellTables.ofGrids(spark, Seq(Fixtures.dfArea, Fixtures.dfIsland))
    cells.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // file formats read everything as nullable; names+types must match
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      cells.schema.map(f => (f.name, f.dataType)))
    val a = cells.orderBy("seq").collect().map(_.toSeq)
    val b = back.orderBy("seq").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("documents round-trip through JSONL and dedup keys survive") {
    val dir = Files.createTempDirectory("graft-jsonl-rt-").toString
    val docs = Seq(
      (1L, "hello world", "en", "s", 11L),
      (2L, "Hello  World", "en", "s", 12L),
      (3L, "unrelated", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").json(dir)
    val (back, bad) = CorpusSources.readJsonl(spark, dir)
    assert(bad.isEmpty)
    // normalization-keyed dedup gives identical groups either way
    val direct = TextDedup.exactDupGroups(docs)
      .select("keep_doc_id", "dup_count").as[(Long, Long)].collect().toSet
    val roundTrip = TextDedup.exactDupGroups(back)
      .select("keep_doc_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(direct == roundTrip)
    assert(direct.contains((1L, 2L))) // 1 and 2 collapse
  }
}
