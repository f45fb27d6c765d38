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

  test("bucketing conventions align (truncate-toward-zero, ADVICE " +
      "r15): pre-epoch events are watermark-dropped in streaming, " +
      "batch buckets them with `div`, and null event_ts rows drop " +
      "instead of NPEing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamAnomaly.ewmaSpikes(
      input.toDF(), bucketMs = 60000L, maxLatenessMinutes = 1)
    val q = out.writeStream
      .format("memory").queryName("spikes_preepoch_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-anom3-").toString)
      .start()
    try {
      // -1,770,000 ms (23:30:30 before epoch). The stream's INITIAL
      // watermark is 0, so a pre-epoch event is late data by
      // definition and never reaches the stateful operator — it must
      // neither crash nor emit a bucket. The null-ts row must filter
      // out BEFORE keying (it would NPE in .getTime otherwise).
      val preEpoch = new Timestamp(-1770000L)
      input.addData(Ev("A", preEpoch), Ev("A", null),
        Ev("A", new Timestamp(3600L * 1000L)))
      q.processAllAvailable()
      input.addData(Ev("A", new Timestamp(2 * 3600L * 1000L)))
      q.processAllAvailable()
      val rows = spark.table("spikes_preepoch_out").as[SpikeOut]
        .collect()
      assert(rows.map(_.bucket).toSeq == Seq(60L), rows.toSeq)
      assert(rows.head.cnt == 1L) // neither dropped row contributed
      // The batch operator CAN see pre-epoch events; its `div`
      // truncates toward zero → bucket -29 (floorDiv would say -30,
      // the divergence the aligned convention removes: the stream-side
      // arithmetic is now ts.getTime / bucketMs, identical semantics)
      assert(preEpoch.getTime / 60000L == -29L)
      val batchBuckets = Anomaly.ewmaSpikes(
          Seq(("A", preEpoch.getTime * 1000L),
            ("A", 3600L * 1000000L)).toDF("event_type", "ts"),
          bucketUs = 60000000L)
        .select(col("bucket")).as[Long].collect().toSet
      assert(batchBuckets.contains(-29L), batchBuckets.toString)
    } finally q.stop()
  }

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
