package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the remaining Structured
  * Streaming join surface beyond the stream-static joins in
  * [[StreamDedup]].
  *
  * The scale problem a stream-stream join must solve is STATE: each
  * side has to buffer rows until the other side can no longer produce
  * a match. Unbounded buffering is a slow OOM on a 100 TB/day feed; the
  * two bounds Spark needs are
  *
  *  1. a WATERMARK on both inputs (how late either side can be), and
  *  2. a TIME-RANGE conjunct in the join condition (how far apart
  *     matching events can be).
  *
  * Together they let the engine evict state deterministically: an
  * impression older than `watermark - maxMatchDelay` can never match a
  * future click and is dropped from the buffer. Both operators here
  * follow that shape; state size is O(events within the match horizon),
  * independent of stream length.
  */
object StreamJoin {

  /** Attribute clicks to the impression they followed: inner equi-join
    * on the ad id plus the `[imp_ts, imp_ts + maxMatchDelay]` time
    * range. Emits `(ad_id, imp_ts, click_ts, click_value)` pairs as
    * soon as both sides arrive (inner joins need no watermark wait to
    * EMIT — only to evict).
    *
    * `impressions` needs columns `ad_id, imp_ts`; `clicks` needs
    * `ad_id, click_ts, click_value`.
    */
  def clickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      maxLateness: String = "10 minutes",
      maxMatchDelay: String = "1 hour"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", maxLateness)
    val clk = clicks.withWatermark("click_ts", maxLateness)
      .withColumnRenamed("ad_id", "click_ad_id")
    imp.join(clk,
      col("ad_id") === col("click_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $maxMatchDelay"))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"),
        col("click_value"))
  }

  /** Impressions that got NO click within the match horizon: the LEFT
    * OUTER flavor. Unmatched rows emit only once the watermark passes
    * `imp_ts + maxMatchDelay` (before that a matching click could still
    * arrive), so the null-side output is delayed by design — that delay
    * IS the correctness contract of outer stream joins.
    */
  def unclickedImpressions(
      impressions: DataFrame,
      clicks: DataFrame,
      maxLateness: String = "10 minutes",
      maxMatchDelay: String = "1 hour"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", maxLateness)
    val clk = clicks.withWatermark("click_ts", maxLateness)
      .withColumnRenamed("ad_id", "click_ad_id")
    imp.join(clk,
        col("ad_id") === col("click_ad_id") &&
          col("click_ts") >= col("imp_ts") &&
          col("click_ts") <= col("imp_ts") + expr(s"INTERVAL $maxMatchDelay"),
        "left_outer")
      .filter(col("click_ts").isNull)
      .select(col("ad_id"), col("imp_ts"))
  }
}
