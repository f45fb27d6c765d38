package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeJoin contract: bin-equi-join + BETWEEN residual reproduces the
  * naive interval join verbatim — including intervals that span many
  * bins, negative coordinates (floor-div, not truncate-div), and
  * boundary-exact endpoints — while planning as an equi-join.
  */
class RangeJoinSpec extends SparkSpec {

  private def points = spark.range(-500, 500)
    .select(col("id").as("p"), (col("id") % 7).as("tag"))
  // overlapping intervals of varied width, some spanning many bins
  private def intervals = spark.range(-50, 50)
    .select((col("id") * 17).as("s"),
      (col("id") * 17 + (col("id") % 5 + 1) * 13).as("e"),
      col("id").as("iv_id"))
    .filter(col("s") <= col("e"))

  private def naive = points.join(intervals,
    col("p") >= col("s") && col("p") <= col("e"))
    .select("p", "tag", "s", "e", "iv_id")

  for (w <- Seq(1L, 10L, 64L)) {
    test(s"binWidth=$w matches the naive interval join") {
      val binned = RangeJoin.pointInInterval(
        points, intervals, col("p"), col("s"), col("e"), binWidth = w)
        .select("p", "tag", "s", "e", "iv_id")
      assert(binned.exceptAll(naive).isEmpty &&
        naive.exceptAll(binned).isEmpty)
      assert(binned.count() == naive.count())
    }
  }

  test("exact past 2^53: epoch-nanos-scale axis values bin correctly") {
    // double-based floor division would round these; decimal must not
    val base = (1L << 62) + 12345L
    val bigPoints = spark.range(0, 200)
      .select((lit(base) + col("id") * 7).as("p"))
    val bigIntervals = spark.range(0, 20)
      .select((lit(base) + col("id") * 70).as("s"),
        (lit(base) + col("id") * 70 + 25).as("e"), col("id").as("iv_id"))
    val naiveBig = bigPoints.join(bigIntervals,
      col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "s", "e", "iv_id")
    val binned = RangeJoin.pointInInterval(
      bigPoints, bigIntervals, col("p"), col("s"), col("e"), binWidth = 30L)
      .select("p", "s", "e", "iv_id")
    assert(binned.exceptAll(naiveBig).isEmpty &&
      naiveBig.exceptAll(binned).isEmpty)
    assert(naiveBig.count() > 0 && binned.count() == naiveBig.count())
  }

  test("plans as an equi-join: no BNLJ, no cartesian product") {
    val plan = RangeJoin.pointInInterval(
      points, intervals, col("p"), col("s"), col("e"), binWidth = 14L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("exact at the bottom of the long range (no subtraction wrap)") {
    val lo = Long.MinValue
    val pts = spark.range(0, 40)
      .select((lit(lo) + col("id")).as("p"))
    val ivs = spark.range(0, 4)
      .select((lit(lo) + col("id") * 10).as("s"),
        (lit(lo) + col("id") * 10 + 6).as("e"), col("id").as("iv_id"))
    val naiveLo = pts.join(ivs,
      col("p") >= col("s") && col("p") <= col("e"))
      .select("p", "iv_id")
    val binned = RangeJoin.pointInInterval(
      pts, ivs, col("p"), col("s"), col("e"), binWidth = 14L)
      .select("p", "iv_id")
    assert(binned.exceptAll(naiveLo).isEmpty &&
      naiveLo.exceptAll(binned).isEmpty)
    assert(naiveLo.count() > 0 && binned.count() == naiveLo.count())
  }

  test("rejects inputs that already carry the helper bin column") {
    val p2 = points.withColumn("__graft_range_bin", lit(1L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        p2, intervals, col("p"), col("s"), col("e"), binWidth = 10L)
    }
  }

  test("rejects a non-positive binWidth") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        points, intervals, col("p"), col("s"), col("e"), binWidth = 0L)
    }
  }
}
