package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Anomaly

/** Streaming EWMA spike detection: watermark-driven bucket
  * finalization, exactly-once verdicts, and bit-parity with the batch
  * operator on the same events.
  */
class StreamAnomalySpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  case class Ev(event_type: String, event_ts: Timestamp)

  private def at(min: Int, sec: Int = 30) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  /** 1-minute buckets, 1-minute lateness; key A: counts 1×8 then a
    * burst of 3 — the hand-computed spike from AnomalySpec, replayed
    * live.
    */
  test("buckets finalize once, in order, with the batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamAnomaly.ewmaSpikes(
      input.toDF(), bucketMs = 60000L, maxLatenessMinutes = 1)
    val q = out.writeStream
      .format("memory").queryName("spikes_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-anom-").toString)
      .start()
    try {
      val evs = (0 to 7).map(m => Ev("A", at(m))) ++
        Seq(Ev("A", at(8, 10)), Ev("A", at(8, 20)), Ev("A", at(8, 40)))
      // two batches: minutes 0-4, then 5-8 (watermark trails 1 min)
      input.addData(evs.take(5): _*)
      q.processAllAvailable()
      input.addData(evs.drop(5): _*)
      q.processAllAvailable()
      // nothing past minute 7 can be final yet (wm = 10:07:40)
      val mid = spark.table("spikes_out").as[SpikeOut].collect()
      assert(mid.forall(r => r.bucket <= minuteBucket(7)), mid.toSeq)
      assert(!mid.exists(_.is_spike), mid.toSeq)

      // advance the watermark far ahead; timeout fires next tick
      input.addData(Ev("B", at(30)))
      q.processAllAvailable()
      input.addData(Ev("B", at(31)))
      q.processAllAvailable()

      val rows = spark.table("spikes_out").as[SpikeOut].collect()
        .filter(_.event_type == "A")
      // every bucket exactly once
      assert(rows.map(_.bucket).sorted.toSeq ==
        (0 to 8).map(minuteBucket), rows.toSeq)
      val burst = rows.find(_.bucket == minuteBucket(8)).get
      assert(burst.cnt == 3L && burst.ewma_num == 255L &&
        burst.is_spike, burst.toString)

      // batch parity: the SAME events through ops.Anomaly.ewmaSpikes
      val batch = Anomaly.ewmaSpikes(
          evs.map(e => (e.event_type, e.event_ts.getTime * 1000L))
            .toDF("event_type", "ts"),
          bucketUs = 60000000L)
        .select(col("event_type"), col("bucket"), col("cnt"),
          coalesce(col("ewma_num"), lit(0L)), col("is_spike"))
        .as[(String, Long, Long, Long, Boolean)].collect().toSet
      val streamed = rows
        .map(r => (r.event_type, r.bucket, r.cnt, r.ewma_num, r.is_spike))
        .toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  private def minuteBucket(m: Int): Long =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00").getTime / 60000L

  test("an empty bucket never enters the history (observation-indexed)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamAnomaly.ewmaSpikes(
      input.toDF(), bucketMs = 60000L, maxLatenessMinutes = 1)
    val q = out.writeStream
      .format("memory").queryName("spikes_gap_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-anom2-").toString)
      .start()
    try {
      // 8 observed minutes, a 10-minute gap, then the burst: the
      // window is the previous OBSERVED buckets, so ewma stays 255
      val evs = (0 to 7).map(m => Ev("A", at(m))) ++
        Seq(Ev("A", at(18, 10)), Ev("A", at(18, 20)), Ev("A", at(18, 40)))
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(Ev("B", at(40)))
      q.processAllAvailable()
      input.addData(Ev("B", at(41)))
      q.processAllAvailable()
      val burst = spark.table("spikes_gap_out").as[SpikeOut].collect()
        .find(r => r.event_type == "A" && r.bucket == minuteBucket(18))
      assert(burst.exists(r => r.ewma_num == 255L && r.is_spike),
        burst.toString)
    } finally q.stop()
  }
}
