package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Merge

/** Streaming SCD2 changelog vs the batch fold: the same snapshot
  * sequence, streamed as row-level updates, must emit exactly the
  * batch chain's closed intervals — across batch boundaries, with
  * identical-payload updates as no-ops.
  */
class StreamScdSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "v")

  test("streamed snapshot feed emits the batch chain's closed rows") {
    // delete-free sequence (a value stream can't observe absence)
    val v1 = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val v2 = snap(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d")
    val v3 = snap(1L -> "a2", 2L -> "B", 3L -> "c", 4L -> "d2")

    val batchClosed = Merge.scd2Apply(
        Merge.scd2Apply(Merge.scd2Init(v1, 1L), v2, "id", 2L),
        v3, "id", 3L)
      .filter(col("valid_to").isNotNull)
      .as[(Long, String, Long, Long)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamScd.changelog(input.toDS()).writeStream
      .format("memory").queryName("scd_changelog")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scd-").toString)
      .start()
    try {
      def feed(df: DataFrame, version: Long): Unit = {
        input.addData(df.as[(Long, String)].collect().toSeq
          .map { case (k, p) => (k, p, version) }: _*)
        q.processAllAvailable()
      }
      feed(v1, 1L)
      assert(spark.table("scd_changelog").count() == 0L,
        "the first snapshot opens rows, closes nothing")
      feed(v2, 2L)
      feed(v3, 3L)
      val streamed = spark.table("scd_changelog")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(streamed == batchClosed,
        s"streamed=$streamed\nbatch=$batchClosed")
      // concretely: 2's 'b' closed at v2; 1's 'a' and 4's 'd' at v3
      assert(streamed == Set((2L, "b", 1L, 2L), (1L, "a", 1L, 3L),
        (4L, "d", 2L, 3L)), streamed.toString)
    } finally q.stop()
  }

  test("identical-payload updates neither emit nor move valid_from") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamScd.changelog(input.toDS()).writeStream
      .format("memory").queryName("scd_noop")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scd2-").toString)
      .start()
    try {
      input.addData((1L, "x", 1L)); q.processAllAvailable()
      input.addData((1L, "x", 2L)); q.processAllAvailable()
      input.addData((1L, "y", 3L)); q.processAllAvailable()
      val rows = spark.table("scd_noop")
        .as[(Long, String, Long, Long)].collect().toSet
      // valid_from stays 1 (the no-op at v2 must not restart the
      // interval), close fires at 3
      assert(rows == Set((1L, "x", 1L, 3L)), rows.toString)
    } finally q.stop()
  }
}
