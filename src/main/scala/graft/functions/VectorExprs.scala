package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native integer-vector kernels for the quantized embedding path.
  *
  * The composed form (`aggregate(zip_with(a, b, ...))`) is the
  * semantic reference, but Spark's higher-order functions are
  * CodegenFallback — per-element interpreted lambda dispatch — which
  * matters exactly where this kernel lives: the all-pairs
  * within-cluster loop of SemDeDup-style dedup, millions of 64-dim
  * dot products per partition. The native node is one tight JIT'd
  * loop inside whole-stage codegen.
  */
object VectorNative {
  def intDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_int_dot: length mismatch (${n} vs ${b.numElements()})")
    var i = 0
    var s = 0L
    while (i < n) {
      // nullable element TYPES pass analysis (parquet list reads carry
      // containsNull=true); an actual null slot has no defined value
      // and must fail loudly, not read as 0
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_int_dot: null array element; drop nulls upstream " +
            "(e.g. array_compact) — quantized codes are never null")
      s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    s
  }
}

/** `(array<int>, array<int>)` equal-length → `bigint` exact integer
  * dot product. 64 dims × 127² stays far inside long range.
  */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeChecks {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireTypes(
      (left.dataType, "two array<int> arguments", isIntArray),
      (right.dataType, "two array<int> arguments", isIntArray))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorNative.intDot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorNative.intDot($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def intDot(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
