package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketches — the sublinear-state aggregates a 100 TB
  * pipeline uses where exact answers would need unbounded memory:
  * HyperLogLog++ cardinalities (fixed ~KB state per group regardless of
  * input size) and approximate quantiles. Both are Catalyst built-ins
  * with map-side partial merging: per-partition sketches merge at the
  * reducer, so the shuffle carries sketch bytes, not rows.
  */
object Sketches {

  /** Per-group HLL cardinality estimates with a relative standard
    * deviation knob (state size ~ 1/rsd²).
    */
  def approxDistinct(
      df: DataFrame,
      groupCol: String,
      countCol: String,
      rsd: Double = 0.02): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(countCol), rsd).as("approx_distinct"),
        count(lit(1)).as("rows"))

  /** Approximate quantiles via the QuantileSummaries sketch.
    * `accuracy` = 1/relative-error (10000 → ~0.01% rank error).
    */
  def approxQuantiles(
      df: DataFrame,
      valueCol: String,
      probs: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col(valueCol),
      array(probs.map(lit): _*), lit(accuracy))
}
