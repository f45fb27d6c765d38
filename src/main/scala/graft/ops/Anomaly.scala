package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-monitoring anomaly detection over bucketed event counts —
  * the "did a crawler go rogue / did a feed die" check a pipeline runs
  * on its own telemetry. Two detectors, both all-integer so every
  * verdict replays exactly:
  *
  *  - [[ewmaSpikes]]: an exponentially-weighted moving average of the
  *    previous `HistLen` OBSERVED buckets (α = 1/2, weights 2⁷…2⁰
  *    scaled integer — no float accumulation), flagging buckets more
  *    than `factor`× their weighted history by cross-multiplication.
  *    Observation-indexed by design: a gap in the series advances the
  *    window to the previous observed buckets rather than zero-filling
  *    (zero-fill needs a calendar spine join; this shape needs ONE
  *    window over (key, bucket) — the sessionize shuffle).
  *  - [[seasonalSpikes]]: hour-of-day seasonal baseline — each bucket
  *    against the leave-one-out mean of all buckets sharing its
  *    (key, hour-of-day) slot, `cnt·(n−1) > factor·(Σ−cnt)` exact.
  *
  * Scale shape: the bucketed count aggregate is map-side combinable
  * and its output is |keys|·|buckets| rows (time-bounded, tiny next
  * to the corpus); the window/baseline algebra runs on that frame.
  */
object Anomaly {

  /** Trailing history length for the EWMA — 8 observations, weights
    * 128,64,…,1 (total 255).
    */
  val HistLen = 8

  private val WeightSum = (1 << HistLen) - 1 // 255

  /** Per-(key, bucket) exact counts from epoch-micros events. */
  private def bucketed(
      events: DataFrame, keyCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    events
      .groupBy(col(keyCol), expr(s"ts div $bucketUs").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** `(key, bucket, cnt, ewma_num, is_spike)` where `ewma_num` =
    * Σ_{d=1..8} cnt_{t−d}·2^(8−d) over the previous observed buckets
    * (null until a full history exists) and `is_spike` flags
    * `cnt·255 > factor·ewma_num` — integer cross-multiplication, no
    * division anywhere.
    */
  def ewmaSpikes(
      events: DataFrame,
      keyCol: String = "event_type",
      bucketUs: Long = 3600L * 1000000L,
      factor: Int = 2): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    // weights halve with distance: lag 1 → 2^7 … lag 8 → 2^0
    val terms: Seq[Column] = (1 to HistLen).map(d =>
      lag(col("cnt"), d).over(w) * lit(1L << (HistLen - d)))
    val ewmaNum = terms.reduce(_ + _) // null while history incomplete
    bucketed(events, keyCol, bucketUs)
      .withColumn("ewma_num", ewmaNum)
      .withColumn("is_spike",
        when(col("ewma_num").isNull, lit(false))
          .otherwise(col("cnt") * WeightSum >
            col("ewma_num") * factor))
  }

  /** `(key, bucket, cnt, slot, base_cnt, base_n, is_spike)`: each
    * bucket vs the leave-one-out mean of its (key, hour-of-day) slot,
    * `cnt·(n−1) > factor·(Σ−cnt)` exact; buckets whose slot has no
    * other observation are never flagged.
    */
  def seasonalSpikes(
      events: DataFrame,
      keyCol: String = "event_type",
      bucketUs: Long = 3600L * 1000000L,
      slotMod: Int = 24,
      factor: Int = 2): DataFrame = {
    require(slotMod > 0, s"slotMod must be positive, got $slotMod")
    val slot = Window.partitionBy(col(keyCol), col("slot"))
    bucketed(events, keyCol, bucketUs)
      .withColumn("slot", pmod(col("bucket"), lit(slotMod.toLong)))
      .withColumn("base_cnt", sum(col("cnt")).over(slot) - col("cnt"))
      .withColumn("base_n", count(lit(1)).over(slot) - lit(1L))
      .withColumn("is_spike",
        col("base_n") > 0 &&
          col("cnt") * col("base_n") > col("base_cnt") * factor)
  }
}
