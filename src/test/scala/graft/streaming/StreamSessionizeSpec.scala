package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Custom-state sessionization: in-batch gap splits, watermark-driven
  * timeouts, and bounded state.
  */
class StreamSessionizeSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  case class Ev(user_id: Long, event_ts: Timestamp)

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("sessions close on in-batch gaps and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamSessionize.sessions(
      input.toDF(), gapMinutes = 10, maxLatenessMinutes = 1)
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sess-").toString)
      .start()
    try {
      // batch 1: user 1 two events 5 min apart, user 2 one event —
      // watermark stays at 10:04, nothing can close yet
      input.addData(Ev(1L, ts(10, 0)), Ev(1L, ts(10, 5)), Ev(2L, ts(10, 0)))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sessions_out").count()
      assert(afterBatch1 == 0L, s"nothing should close yet: $afterBatch1")

      // batch 2: user 2 returns 30 min later — the open (10:00) session
      // closes on the in-batch gap rule immediately; the batch also
      // advances the watermark past user 1's end + gap, so user 1's
      // timeout fires on a subsequent tick
      input.addData(Ev(2L, ts(10, 30)))
      q.processAllAvailable()
      val afterBatch2 = spark.table("sessions_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(afterBatch2.contains((2L, ts(10, 0), ts(10, 0), 1L)),
        afterBatch2.toString)

      // push the watermark far ahead (twice: it updates at end of
      // batch, timeouts fire in the following one)
      input.addData(Ev(3L, ts(12, 0)))
      q.processAllAvailable()
      input.addData(Ev(3L, ts(12, 1)))
      q.processAllAvailable()

      val rows = spark.table("sessions_out")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(rows.contains((1L, ts(10, 0), ts(10, 5), 2L)), rows.toString)
      assert(rows.contains((2L, ts(10, 30), ts(10, 30), 1L)), rows.toString)
    } finally q.stop()
  }

  test("late event within the watermark merges into the open session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamSessionize.sessions(
      input.toDF(), gapMinutes = 10, maxLatenessMinutes = 10)
    val q = out.writeStream
      .format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sessl-").toString)
      .start()
    try {
      input.addData(Ev(1L, ts(10, 10)))
      q.processAllAvailable()
      // out-of-order but within watermark and gap: extends session start
      input.addData(Ev(1L, ts(10, 2)))
      q.processAllAvailable()
      // advance watermark well past 10:10 + gap, twice
      input.addData(Ev(3L, ts(11, 0)))
      q.processAllAvailable()
      input.addData(Ev(3L, ts(11, 1)))
      q.processAllAvailable()
      val rows = spark.table("sessions_late")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(rows.contains((1L, ts(10, 2), ts(10, 10), 2L)), rows.toString)
    } finally q.stop()
  }

  test("lateness beyond the gap is rejected — merge would not be exact") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    intercept[IllegalArgumentException] {
      StreamSessionize.sessions(
        input.toDF(), gapMinutes = 10, maxLatenessMinutes = 15)
    }
  }
}
