package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RewriteRangeJoin contract: a naive inequality-only interval join
  * plans as a binned EQUI-join (no BNLJ, no cartesian) and returns
  * exactly the rows of the un-rewritten join; joins that already have
  * an equi-key are left alone.
  */
class RewriteRangeJoinSpec extends SparkSpec {

  // range-derived (not LocalRelation) so the optimizer can't constant-
  // fold the join away before the rule sees it
  private def points = spark.range(-300, 300)
    .select(col("id").as("p"), (col("id") % 5).as("tag"))
  private def intervals = spark.range(-40, 40)
    .select((col("id") * 11).as("s"),
      (col("id") * 11 + (col("id") % 7 + 3) * 9).as("e"),
      col("id").as("iv_id"))
    .filter(col("s") <= col("e"))

  private def withRule[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(RewriteRangeJoin.EnabledKey)
    spark.conf.set(RewriteRangeJoin.EnabledKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(RewriteRangeJoin.EnabledKey, v)
      case None    => spark.conf.unset(RewriteRangeJoin.EnabledKey)
    }
  }

  private def sortedRows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("naive BETWEEN join is rewritten to a binned equi-join") {
    val naive = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"))
    val plan = withRule(on = true)(
      naive.queryExecution.executedPlan.toString)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__graft_bin"), plan)

    val (rewritten, plain) = (
      withRule(on = true)(sortedRows(naive)),
      withRule(on = false)(sortedRows(naive)))
    assert(plain.nonEmpty && rewritten == plain)
  }

  test("strict bounds and flipped operand order are also rewritten") {
    val naive = points.join(intervals,
      col("s") < col("p") && col("e") > col("p"))
    val plan = withRule(on = true)(
      naive.queryExecution.executedPlan.toString)
    assert(plan.contains("__graft_bin") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(withRule(on = true)(sortedRows(naive)) ==
      withRule(on = false)(sortedRows(naive)))
  }

  test("a join with an equi-conjunct is left untouched") {
    val df = points.join(intervals,
      col("p") === col("iv_id") && col("p") >= col("s") &&
        col("p") <= col("e"))
    val plan = withRule(on = true)(
      df.queryExecution.executedPlan.toString)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("disabled by conf: the naive plan comes back") {
    val naive = points.join(intervals,
      col("p") >= col("s") && col("p") <= col("e"))
    val plan = withRule(on = false)(
      naive.queryExecution.executedPlan.toString)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("explicit pointInInterval and the auto-rewrite plan the same shape") {
    // Both paths must bin with an arithmetic shift and plan ONE
    // broadcast equi-join on the bin key — this pin is what keeps the
    // explicit API from drifting back to per-row decimal bin math (6x
    // slower) while the rule stays fast, or vice versa.
    val explicitPlan = graft.ops.RangeJoin.pointInInterval(
      points, intervals, col("p"), col("s"), col("e"), binWidth = 14L)
      .queryExecution.executedPlan.toString
    val autoPlan = withRule(on = true)(
      points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
        .queryExecution.executedPlan.toString)
    for ((label, plan) <- Seq("explicit" -> explicitPlan,
        "auto" -> autoPlan)) {
      assert(plan.contains("BroadcastHashJoin"), s"$label:\n$plan")
      assert(plan.toLowerCase.contains("shiftright"), s"$label:\n$plan")
      assert(!plan.contains("decimal(38,0)"), s"$label:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct") &&
        !plan.contains("SortMergeJoin"), s"$label:\n$plan")
    }
  }

  test("inverted intervals match nothing and do not crash") {
    val inverted = spark.range(0, 20)
      .select((col("id") * 10 + 9).as("s"), (col("id") * 10).as("e"))
    val df = points.join(inverted,
      col("p") >= col("s") && col("p") <= col("e"))
    assert(withRule(on = true)(df.count()) == 0L)
  }

  test("wide intervals hit the fan-out guard with an actionable error") {
    // spans of ~9e5 bins at the default width 32
    val wide = spark.range(0, 5)
      .select((col("id") * 100).as("s"),
        (col("id") * 100 + 30000000L).as("e"))
    val df = points.join(wide,
      col("p") >= col("s") && col("p") <= col("e"))
    val e = intercept[Exception] { withRule(on = true)(df.collect()) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("graft range-join rewrite")),
      e.toString)

    // same query succeeds once the width suits the interval length
    val prev = spark.conf.getOption(RewriteRangeJoin.WidthKey)
    spark.conf.set(RewriteRangeJoin.WidthKey, "33554432") // 2^25
    try assert(withRule(on = true)(df.count()) ==
      withRule(on = false)(df.count()))
    finally prev match {
      case Some(v) => spark.conf.set(RewriteRangeJoin.WidthKey, v)
      case None    => spark.conf.unset(RewriteRangeJoin.WidthKey)
    }
  }

  test("non-integral axis (double) is not rewritten") {
    val dpoints = points.select(col("p").cast("double").as("p"), col("tag"))
    val dintervals = intervals.select(col("s").cast("double").as("s"),
      col("e").cast("double").as("e"), col("iv_id"))
    val df = dpoints.join(dintervals,
      col("p") >= col("s") && col("p") <= col("e"))
    val plan = withRule(on = true)(
      df.queryExecution.executedPlan.toString)
    assert(!plan.contains("__graft_bin"), plan)
  }
}
