package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve encoding — the data-LAYOUT operator for
  * 100 TB scans.
  *
  * Range-partitioning and sorting a table by the interleaved-bit key of
  * two scan dimensions clusters rows that are close in BOTH dimensions
  * into the same files/row groups, so min/max statistics prune scans
  * with predicates on EITHER dimension — the Delta/Iceberg `ZORDER BY`
  * idea, here as a plain Catalyst expression usable with
  * `repartitionByRange` + `sortWithinPartitions` on any sink.
  *
  * Encoding: the low 32 bits of `x` land on even bit positions, the
  * low 32 bits of `y` on odd positions (higher input bits are masked
  * off — callers bucket wider domains first). Bit spreading uses the
  * standard magic-mask doubling sequence: 5 shift+mask steps instead
  * of a 32-iteration loop, branch-free in generated code.
  */
object ZOrderNative {

  /** Spread the low 32 bits of `v` onto even bit positions (0,2,4,…). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x's bits on even positions, y's on odd. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** `graft_zorder(x, y)` — 64-bit Morton code of two long columns. */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression with GraftTypeChecks {

  override def checkInputDataTypes(): TypeCheckResult =
    requireTypes(
      (left.dataType, "a bigint x argument", (t: DataType) => t == LongType),
      (right.dataType, "a bigint y argument", (t: DataType) => t == LongType))

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderNative.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrderNative.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Morton key of two long columns (see [[ZOrderNative]]). */
  def zorder(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrderExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Cluster a frame for two-dimensional scan locality: range-partition
    * on the Morton key (contiguous z-ranges per output file — each file
    * covers a compact rectangle-ish region of (x, y) space), sort
    * within partitions so row-group min/max stats are tight.
    */
  def clusterByZ(
      df: org.apache.spark.sql.DataFrame,
      x: Column,
      y: Column,
      numPartitions: Int): org.apache.spark.sql.DataFrame = {
    val key = zorder(x, y)
    df.repartitionByRange(numPartitions, key).sortWithinPartitions(key)
  }
}
