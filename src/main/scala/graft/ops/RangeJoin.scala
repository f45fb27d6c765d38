package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without a cross product.
  *
  * The naive formulation — `points JOIN intervals ON p BETWEEN s AND e`
  * — has no equi-key, so Spark plans BroadcastNestedLoopJoin (or a
  * cartesian product): every point is tested against every interval.
  * At 100 TB that is the difference between a job and a non-starter.
  *
  * The scale shape is BINNING: quantize the joined axis into
  * fixed-width bins; a point lands in exactly one bin, an interval
  * lands in every bin it overlaps (a `sequence` + `explode`, ≤ 2 rows
  * per interval when `binWidth` ≥ the typical interval length — pick
  * it that way). Bin-equal pairs are the only ones that can satisfy
  * the BETWEEN, so an ordinary shuffled equi-join on the bin key plus
  * the exact BETWEEN residual reproduces the naive join's rows
  * verbatim. Join work drops from |P|×|I| to Σ(per-bin products), and
  * both sides partition/parallelize like any equi-join (skewed bins
  * respond to AQE skew splitting like any other hot key).
  */
object RangeJoin {

  /** Equi-binned point-in-interval join. `point`, `start`, `end` are
    * integral Columns on `points`/`intervals` respectively (epoch days,
    * epoch seconds — any monotone integer axis). Inner-join semantics:
    * points matching no interval (and intervals holding no points)
    * don't appear. Intervals must satisfy `start <= end`.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      point: Column,
      start: Column,
      end: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__graft_range_bin"
    require(!(points.columns ++ intervals.columns).contains(bin),
      s"input already has a '$bin' column — rename it before the join")
    val p = points.withColumn(bin, floorDiv(point, binWidth))
    val i = intervals
      .withColumn(bin,
        explode(sequence(floorDiv(start, binWidth), floorDiv(end, binWidth))))
    p.join(i, bin)
      .filter(point.between(start, end))
      .drop(bin)
  }

  /** Floor division as a Column. `x - pmod(x, w)` is exactly divisible
    * by `w` (and floors correctly for negatives, unlike `div`'s
    * truncation); BOTH the subtraction and the division run in DECIMAL
    * so the result is exact over the full long range — a double
    * formulation silently rounds past 2^53 (epoch-NANOS axes live
    * there), and a long subtraction would wrap for x within `w` of
    * Long.MinValue.
    */
  private def floorDiv(x: Column, w: Long): Column =
    ((x.cast("decimal(38,0)") - pmod(x, lit(w)).cast("decimal(38,0)")) /
      lit(w)).cast("long")
}
