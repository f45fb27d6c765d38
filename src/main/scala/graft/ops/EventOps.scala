package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence operators over a `(event_id, user_id, ts)` stream
  * table (`ts` = an epoch instant as BIGINT in any single consistent
  * unit — the callers feed epoch micros): sessionization and as-of
  * joins, the two classic "order within key" analyses.
  *
  * Both are single-shuffle shapes: one hash partition on the key, one
  * sort within partitions, then pure window arithmetic — no self-join,
  * no range-join explosion, no state beyond the window frame. That is
  * the shape that survives 100 TB: per-user event counts are bounded,
  * so a partition-skew guard is only needed for degenerate hot users
  * (salt the key and merge sessions across salt boundaries if one user
  * exceeds a partition).
  */
object EventOps {

  /** 30 minutes, in nanoseconds — the classic web-session gap. */
  val SessionGapNs: Long = 30L * 60 * 1000 * 1000 * 1000

  /** Gap-based sessionization: a new session starts when the time since
    * the user's previous event exceeds `gapNs`. Emits `session_idx`
    * (0-based per user, in time order) — `lag` to detect the boundary,
    * a running `sum` to number the sessions, both over the same
    * (partition, sort) so Spark plans ONE shuffle + ONE sort.
    */
  def sessionize(events: DataFrame, gapNs: Long = SessionGapNs): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val boundary =
      when(col("ts") - lag(col("ts"), 1).over(order) > gapNs, 1L)
        .otherwise(0L)
    events
      .withColumn("session_idx",
        sum(boundary).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** As-of lookup composed from existing operators (no custom plan
    * needed): for every event, the most recent `ts` at or before it —
    * same user — among rows matching `matchPred`. The carry-forward
    * `last(..., ignoreNulls)` over a running frame IS the as-of join,
    * with one shuffle and zero joins; a range self-join formulation
    * would explode quadratically on hot users.
    *
    * Rows matching `matchPred` sort before non-matching rows at equal
    * `ts` (match-first tie order), so an equal-timestamp match is
    * visible to the row it matches — the `>=` as-of convention.
    */
  def withAsofTs(
      events: DataFrame,
      matchPred: Column,
      asCol: String): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(matchPred, 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn(asCol,
      last(when(matchPred, col("ts")), ignoreNulls = true).over(order))
  }
}
