package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native backward as-of join — the full custom-operator ladder:
  * a [[LogicalPlan]] node, a [[SparkStrategy]], and a [[SparkPlan]]
  * executing a single merge pass, registered through
  * [[graft.GraftExtensions]].
  *
  * Semantics (pandas `merge_asof` / SQL `ASOF LEFT JOIN`): every left
  * row `(k, t)` is joined to the right row with the same key and the
  * LARGEST right timestamp `<= t`, or nulls when no such row exists.
  * Left rows are never dropped or duplicated (ties on the right
  * timestamp all carry the same ts value a caller would project; the
  * merge keeps the last in sort order).
  *
  * Why a physical operator: composed formulations either self-join on
  * a range (quadratic on hot keys) or union both streams through one
  * window ([[graft.ops.EventOps.withAsofTs]] — fine, but it forces the
  * two inputs into one shuffle+sort of their combined width). The
  * native exec asks the planner for exactly what a 100 TB run wants:
  * each side hash-clustered on ITS OWN key and sorted `(key, ts)` —
  * Catalyst's EnsureRequirements co-partitions the two shuffles — then
  * a single forward-only merge per partition: O(|L|+|R|) time, O(1)
  * state (one lookahead + one candidate row), no buffering of either
  * side, AQE-compatible because the requirements are declared, not
  * hand-scheduled.
  *
  * Null keys / timestamps never match (SQL join semantics) on either
  * side.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, fwd) =>
      AsofJoinExec(lk, rk, lt, rt, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are required hash-clustered on
  * their key and sorted `(key asc, ts asc)`; the merge walks both
  * sorted iterators once per partition. `forward = false` matches the
  * largest right ts `<= t` (the `>=` convention); `forward = true`
  * matches the smallest right ts `>= t` — both are monotone
  * single-pass merges because left timestamps are non-decreasing
  * within a key.
  */
case class AsofJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // rows stream through in left order, one output row per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val (lKeyE, lTsE) = (leftKey, leftTs)
    val (rKeyE, rTsE) = (rightKey, rightTs)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (lIter.isEmpty) Iterator.empty
      else {
        val lk = BindReferences.bindReference(lKeyE, leftOut)
        val lt = BindReferences.bindReference(lTsE, leftOut)
        val rk = BindReferences.bindReference(rKeyE, rightOut)
        val rt = BindReferences.bindReference(rTsE, rightOut)
        val keyOrd = TypeUtils.getInterpretedOrdering(lKeyE.dataType)
          .asInstanceOf[Ordering[Any]]
        val tsOrd = TypeUtils.getInterpretedOrdering(lTsE.dataType)
          .asInstanceOf[Ordering[Any]]
        val nullRow = new GenericInternalRow(rightOut.size)
        val joined = new JoinedRow
        // bind against the NULLABLE view of the right side: the null-fill
        // row has null fields even where the child schema says
        // non-nullable, and a nullable=false BoundReference would skip
        // the null check and read garbage zeros
        val project = UnsafeProjection.create(
          outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))

        // one-row lookahead over the right side, null-key/ts rows
        // skipped; sort iterators reuse row memory, so the lookahead
        // (the only retained row) is copied
        var rHead: InternalRow = null
        var rHeadKey: Any = null
        var rHeadTs: Any = null
        def advanceHead(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val row = rIter.next()
            if (rk.eval(row) != null && rt.eval(row) != null) {
              // evaluate key/ts AFTER copying: for buffer-backed types
              // (UTF8String, Decimal, binary) eval on the iterator's
              // reused row returns views into memory the next
              // rIter.next() overwrites
              rHead = row.copy()
              rHeadKey = rk.eval(rHead)
              rHeadTs = rt.eval(rHead)
            }
          }
        }
        advanceHead()
        var cand: InternalRow = null
        var candKey: Any = null

        lIter.map { l =>
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null) {
            project(joined(l, nullRow))
          } else if (forward) {
            // discard right rows that sort before (k, t): they can't
            // match this left row nor any later one; the surviving
            // lookahead is NOT consumed on match — the same right row
            // may be the "next" row for several left rows
            var continue = rHead != null
            while (continue) {
              val c = keyOrd.compare(rHeadKey, k)
              if (c < 0 || (c == 0 && tsOrd.compare(rHeadTs, t) < 0)) {
                advanceHead()
                continue = rHead != null
              } else continue = false
            }
            val matched = rHead != null && keyOrd.compare(rHeadKey, k) == 0
            project(joined(l, if (matched) rHead else nullRow))
          } else {
            var continue = rHead != null
            while (continue) {
              val c = keyOrd.compare(rHeadKey, k)
              if (c < 0 || (c == 0 && tsOrd.compare(rHeadTs, t) <= 0)) {
                cand = rHead; candKey = rHeadKey
                advanceHead()
                continue = rHead != null
              } else continue = false
            }
            val matched = cand != null && keyOrd.compare(candKey, k) == 0
            project(joined(l, if (matched) cand else nullRow))
          }
        }
      }
    }
  }
}

/** Public API over the native operator. */
object Asof {

  /** Backward as-of LEFT join by column NAME (names, not Columns, so
    * resolution is per-side and can never be ambiguous when both sides
    * share column names). Right-side columns appear nulled on no-match
    * rows; rename them before joining if they collide with left names.
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTsCol: String,
      rightTsCol: String): DataFrame =
    join(left, right, leftKeyCol, rightKeyCol, leftTsCol, rightTsCol,
      forward = false)

  /** Forward as-of LEFT join: the smallest right ts `>= t` per key. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTsCol: String,
      rightTsCol: String): DataFrame =
    join(left, right, leftKeyCol, rightKeyCol, leftTsCol, rightTsCol,
      forward = true)

  private def join(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      forward: Boolean): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // self-joins share attribute exprIds between the two children, and
    // a custom node gets no DeduplicateRelations help from the
    // analyzer — re-alias the right side so every right attribute is a
    // fresh exprId (names unchanged) and output resolution can't
    // silently bind right columns to left values
    val rPlan0 = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"$side side has no column '$name' " +
            s"(has: ${plan.output.map(_.name).mkString(", ")})"))
    val (lk, rk) = (attr(lPlan, leftKeyCol, "left"),
      attr(rPlan, rightKeyCol, "right"))
    val (lt, rt) = (attr(lPlan, leftTsCol, "left"),
      attr(rPlan, rightTsCol, "right"))
    // the exec orders/partitions with the LEFT types; a mismatched
    // right type would CCE on executors (or worse, mis-co-partition) —
    // fail fast at the driver instead
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: $leftKeyCol is ${lk.dataType.catalogString}, " +
        s"$rightKeyCol is ${rk.dataType.catalogString}")
    require(lt.dataType == rt.dataType,
      s"as-of ts types differ: $leftTsCol is ${lt.dataType.catalogString}, " +
        s"$rightTsCol is ${rt.dataType.catalogString}")
    ColumnBridge.ofRows(left.sparkSession,
      AsofJoin(lPlan, rPlan, lk, rk, lt, rt, forward))
  }
}
