package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for corpus curation — the
  * "rebalance the language mix" / "take a stable p% slice" operators a
  * training-data pipeline runs constantly.
  *
  * Design: a row is kept iff the first 4 hex chars of `md5(key)` fall
  * below a per-stratum threshold. That makes the sample
  *
  *  - **deterministic**: same corpus → same sample, on any cluster
  *    size, any partitioning, any run (no `rand()`, no seed plumbing);
  *  - **content-keyed**: a document keeps/loses membership based on its
  *    own bytes, so re-shards, re-ingests and dedup passes can't flip
  *    membership — the property that makes train/eval splits stable;
  *  - **scan-shaped**: a pure per-row predicate — no shuffle, no state,
  *    survives any scale-up untouched. At 100 TB the plan is scan →
  *    filter, and column pruning still reaches the parquet reader.
  *
  * The threshold compare is LEXICAL on fixed-width lowercase hex
  * (`'0'<'9'<'a'<'f'` — ASCII order equals numeric order), which is why
  * it replays exactly in the DuckDB oracle: both engines print md5 as
  * lowercase hex over the UTF-8 bytes.
  *
  * Reference analog: none (the reference has no sampling surface) —
  * this is part of the LLM-pipeline extension mandated by the brief.
  */
object Sampling {

  /** 16-bit content bucket: first 4 hex chars of md5(key). */
  def hexBucket(key: Column): Column = substring(md5(key), 1, 4)

  /** 4-hex-digit exclusive upper bound for a keep-rate in [0,1].
    * rate=1.0 maps to "g000" — lexically above every hex bucket (hex
    * chars are 0-9a-f < 'g'), so it keeps everything while staying
    * fixed-width-comparable.
    */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    val n = math.round(rate * 65536.0)
    if (n >= 65536L) "g000" else f"$n%04x"
  }

  /** Stable Bernoulli(rate) sample keyed on `key`'s content. */
  def deterministicSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hexBucket(key) < lit(thresholdHex(rate)))

  /** Stratified sample: per-stratum keep-rates (e.g. downsample an
    * over-represented language), `defaultRate` for unlisted strata.
    * One CASE-shaped predicate — still scan-only, still deterministic.
    */
  def stratifiedSample(
      df: DataFrame,
      strata: Column,
      key: Column,
      rates: Seq[(String, Double)],
      defaultRate: Double): DataFrame = {
    val threshold = rates.foldRight(lit(thresholdHex(defaultRate)): Column) {
      case ((stratum, rate), acc) =>
        when(strata === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(hexBucket(key) < threshold)
  }

  /** Deterministic per-key cap — "at most `k` documents per domain/
    * language/source", the anti-spam guard every crawl corpus applies.
    * Rows are ranked inside each key by content hash (an unbiased,
    * run-stable shuffle of the key's rows — NOT "first k in file
    * order", which would bias toward old crawl segments), ties broken
    * by `tieBreaker` (must be unique per row for determinism), and
    * rows ranked past `k` drop.
    *
    * Scale shape: one shuffle on the cap key, and Spark's rank-limit
    * pushdown (`WindowGroupLimit`) keeps only k rows per key per map
    * task BEFORE the shuffle — a hot domain never concentrates its
    * full fan-in on one reducer's input.
    */
  def capPerKey(
      df: DataFrame,
      key: Column,
      tieBreaker: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key)
      .orderBy(md5(tieBreaker.cast("string")), tieBreaker)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Weighted systematic sample: ≈`k` rows per group, selection
    * probability proportional to an integer weight, fully
    * deterministic. A row is kept iff its weight interval
    * `[cum - w, cum)` on the group's cumulative-weight axis crosses one
    * of the k evenly spaced thresholds — the classic systematic
    * (fixed-step) design, which unlike independent Bernoulli draws
    * yields a sample size within ±1 of k per group.
    *
    * All arithmetic is integral (`cum * k` then floor-divide by the
    * group total), so the selection replays EXACTLY in SQL on any
    * engine; correct while `max(cum) * k < 2^53` (the floor-divide
    * rides double math — at larger scale, sub-group first).
    *
    * Scale shape: one window over `(group, order)` — parallel across
    * groups, same shape as sessionization; heavy single groups are the
    * caller's cue to refine `group`.
    */
  def systematicByWeight(
      df: DataFrame,
      group: Column,
      weight: Column,
      order: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val cumW = Window.partitionBy(group).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(group)
    df.filter(weight > 0)
      .withColumn("__cum", sum(weight).over(cumW))
      .withColumn("__tot", sum(weight).over(totW))
      .filter(
        floor((col("__cum") * k) / col("__tot")) >
          floor(((col("__cum") - weight) * k) / col("__tot")))
      .drop("__cum", "__tot")
  }
}
