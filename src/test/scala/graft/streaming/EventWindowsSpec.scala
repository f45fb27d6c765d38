package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Watermarked event-time windows: append-mode finalization and
  * late-data dropping — SURVEY §2.9's streaming surface beyond the
  * chunk loop.
  */
class EventWindowsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  case class Ev(event_ts: Timestamp, event_type: String, value: Double)

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermark finalizes windows in append mode and drops late events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventWindows.tumblingCounts(
      input.toDF(), windowLength = "10 minutes", maxLateness = "5 minutes")
    val q = out.writeStream
      .format("memory").queryName("ev_windows")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-evw-").toString)
      .start()
    try {
      // window [10:00,10:10): two clicks
      input.addData(Ev(ts(1), "click", 1.0), Ev(ts(4), "click", 2.0))
      q.processAllAvailable()
      // advance event time past 10:10 + 5min lateness -> first window final
      input.addData(Ev(ts(21), "view", 1.0))
      q.processAllAvailable()
      // a LATE click for the finalized window: must be dropped
      input.addData(Ev(ts(2), "click", 99.0))
      q.processAllAvailable()
      // push watermark far ahead so the 10:20 window finalizes too
      input.addData(Ev(ts(59), "view", 1.0))
      q.processAllAvailable()

      val rows = spark.table("ev_windows")
        .select("event_type", "cnt", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      // the finalized first window has exactly the two on-time clicks;
      // the late 99.0 click never appears
      assert(rows.contains(("click", 2L, 3.0)), rows.toString)
      assert(!rows.exists { case (_, _, s) => s == 99.0 || s == 102.0 })
    } finally q.stop()
  }

  test("sliding windows fan each event into overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = EventWindows.slidingCounts(
      input.toDF(), windowLength = "10 minutes", slide = "5 minutes",
      maxLateness = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("ev_sliding")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-evs-").toString)
      .start()
    try {
      input.addData(Ev(ts(7), "click", 1.0)) // in [10:00,10:10) and [10:05,10:15)
      q.processAllAvailable()
      input.addData(Ev(ts(40), "view", 1.0)) // advance watermark, finalize
      q.processAllAvailable()
      val n = spark.table("ev_sliding")
        .filter($"event_type" === "click").count()
      assert(n == 2L, s"expected the click in 2 overlapping windows, got $n")
    } finally q.stop()
  }
}
