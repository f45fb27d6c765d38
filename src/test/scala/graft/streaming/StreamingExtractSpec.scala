package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.ops.{CellTables, Fixtures}
import graft.schema.RawTableRow

/** Streaming semantics (SURVEY §2.9): cross-batch first-occurrence
  * province dedup via keyed state, and the foreachBatch chunk loop over
  * a file source.
  */
class StreamingExtractSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("stateful dedup emits each province once ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingExtract.ProvinceRow]
    val deduped = StreamingExtract.dedupProvincesStateful(input.toDS())
    val q = deduped.writeStream
      .format("memory").queryName("prov_dedup")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-").toString)
      .start()
    try {
      // batch 1: two distinct provinces, one repeated inside the batch
      input.addData(
        StreamingExtract.ProvinceRow("11", "Aceh", 0L),
        StreamingExtract.ProvinceRow("11", "Aceh dup", 5L),
        StreamingExtract.ProvinceRow("12", "Sumut", 1L))
      q.processAllAvailable()
      // batch 2: "11" again (cross-batch dup) plus a new province
      input.addData(
        StreamingExtract.ProvinceRow("11", "Aceh again", 9L),
        StreamingExtract.ProvinceRow("13", "Sumbar", 10L))
      q.processAllAvailable()
      val out = spark.table("prov_dedup")
        .as[StreamingExtract.ProvinceRow].collect()
        .sortBy(_.code)
      assert(out.map(_.code).toSeq == Seq("11", "12", "13"))
      // first occurrence in document order won (seq 0, not 5 or 9)
      assert(out.head.name == "Aceh")
    } finally q.stop()
  }

  test("foreachBatch file-source run extracts each entity per chunk") {
    val srcDir = Files.createTempDirectory("graft-stream-src-")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt-")
    // chunk 1 lands before the stream starts (the backlog)
    CellTables.ofGrids(spark, Seq(Fixtures.dfArea))
      .write.mode("append").parquet(srcDir.toString)
    CellTables.ofGrid(spark, Fixtures.dfIsland, tableId = 7L, seqStart = 100L)
      .write.mode("append").parquet(srcDir.toString)

    val counts = scala.collection.concurrent.TrieMap.empty[String, Long]
    val batchIds = scala.collection.concurrent.TrieMap.empty[Long, Unit]
    val q = StreamingExtract.run(
      StreamingExtract.readCells(spark, srcDir.toString),
      ckpt.toString,
      (batchId, entity, df) => {
        val n = df.count()
        batchIds.put(batchId, ())
        counts.updateWith(entity) { c => Some(c.getOrElse(0L) + n) }
        ()
      })
    q.awaitTermination()

    assert(counts("province") >= 1L)
    assert(counts("island") >= 1L)
    assert(counts.keySet ==
      Set("province", "regency", "district", "village", "island"))
    assert(batchIds.keySet.nonEmpty) // checkpointed ids delivered
  }
}
