package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-stage aggregation — the standard defense when a
  * `groupBy` key is skewed (a handful of hot keys would otherwise pin
  * single reducers while the rest of a 1000-executor cluster idles).
  *
  * Stage 1 groups by (key, salt): the hot key's rows spread over
  * `buckets` reducers, each producing a partial aggregate. Stage 2
  * re-groups the tiny partials by key alone. Works for any algebraic
  * aggregate (sum/count/min/max here); AQE's skew-join handling covers
  * joins, this covers aggregations.
  *
  * Note Spark's hash aggregation already does map-side partial
  * aggregation, which absorbs most skew for algebraic functions; the
  * explicit salt matters when per-map-task cardinality is too high for
  * the partial hash table (spill) or for `collect_list`-style
  * non-reducing aggregates.
  */
object SkewAgg {

  /** Sum/count `value` by `key` with an explicit salt stage.
    * `salt` must be deterministic per row (e.g. `pmod(hash(id), n)`).
    * Output: (key, sum_value, cnt) — identical to the unsalted
    * `groupBy(key).agg(sum, count)`.
    */
  def sumCountSalted(
      df: DataFrame,
      key: Column,
      value: Column,
      salt: Column,
      keyName: String = "key"): DataFrame =
    df.select(key.as(keyName), value.as("__v"), salt.as("__salt"))
      .groupBy(col(keyName), col("__salt"))
      .agg(sum(col("__v")).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyName))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("cnt"))
}
