package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** Stream-stream joins: inner attribution emits matches immediately;
  * the left-outer flavor emits unmatched impressions only after the
  * watermark proves no click can still arrive.
  */
class StreamJoinSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  case class Imp(ad_id: Long, imp_ts: Timestamp)
  case class Clk(ad_id: Long, click_ts: Timestamp, click_value: Double)

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("inner join attributes clicks within the match horizon only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val out = StreamJoin.clickAttribution(
      imps.toDF(), clks.toDF(),
      maxLateness = "5 minutes", maxMatchDelay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("attrib")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssj-").toString)
      .start()
    try {
      imps.addData(Imp(1, ts(0)), Imp(2, ts(0)))
      // ad 1: click inside the horizon; ad 2: click outside it;
      // ad 3: click with no impression at all
      clks.addData(Clk(1, ts(7), 1.5), Clk(2, ts(20), 9.9),
        Clk(3, ts(7), 7.7))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("ad_id", "click_value").as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 1.5)), rows.toString)
    } finally q.stop()
  }

  test("left-outer join emits unclicked impressions after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val out = StreamJoin.unclickedImpressions(
      imps.toDF(), clks.toDF(),
      maxLateness = "5 minutes", maxMatchDelay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("unclicked")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ssjo-").toString)
      .start()
    try {
      imps.addData(Imp(1, ts(0)), Imp(2, ts(0)))
      clks.addData(Clk(1, ts(7), 1.5))
      q.processAllAvailable()
      // nothing final yet: ad 2 could still be clicked until the
      // watermark passes 10:00 + 10min delay (+5min lateness)
      assert(spark.table("unclicked").isEmpty)
      // advance BOTH watermarks past the horizon (the operator uses
      // the min of the two input watermarks)
      imps.addData(Imp(99, ts(40)))
      clks.addData(Clk(98, ts(40), 0.0))
      q.processAllAvailable()
      imps.addData(Imp(97, ts(55)))
      clks.addData(Clk(96, ts(55), 0.0))
      q.processAllAvailable()
      val unclicked = spark.table("unclicked")
        .select("ad_id").as[Long].collect().toSet
      assert(unclicked.contains(2L), unclicked.toString)
      assert(!unclicked.contains(1L), unclicked.toString)
    } finally q.stop()
  }
}
