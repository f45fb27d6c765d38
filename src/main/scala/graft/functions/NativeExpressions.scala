package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the three procedural cleanse
  * functions — the (b) tier of the engine's extension ladder: a custom
  * `Expression` with `doGenCode` beats a Scala UDF because it skips the
  * ScalaUDF machinery entirely (no encoder round-trip, no
  * `Option`/null boxing, no lambda dispatch) and participates in
  * whole-stage codegen: the generated Java calls the static Scala
  * helper directly on the `UTF8String` input.
  *
  * The string algorithms themselves stay in [[Cleanse]] /
  * [[Coordinates]] (single source of truth, unit-tested against the
  * reference's pinned tables); these nodes are the codegen wrappers.
  */
abstract class StringMapExpression extends UnaryExpression {
  /** Fully-qualified static method `String => String` to invoke. */
  def staticCall: String
  def eval(s: String): String

  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(eval(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$staticCall($c.toString()))")
}

/** `normalize_words` (`utils.py:68-79`) as a codegen'd expression. */
case class NormalizeWordsExpr(child: Expression) extends StringMapExpression {
  override def staticCall: String =
    "graft.functions.Cleanse.normalizeWordsScala"
  override def eval(s: String): String = Cleanse.normalizeWordsScala(s)
  override def prettyName: String = "graft_normalize_words"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** `fix_wrapped_name` (`utils.py:41-65`) as a codegen'd expression. */
case class FixWrappedNameExpr(child: Expression) extends StringMapExpression {
  override def staticCall: String =
    "graft.functions.NativeExpressions.fixWrappedNameStatic"
  override def eval(s: String): String = Cleanse.fixWrappedNameScala(s)
  override def prettyName: String = "graft_fix_wrapped_name"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** `format_coordinate` (`utils.py:189-225`) as a codegen'd expression. */
case class FormatCoordinateExpr(child: Expression) extends StringMapExpression {
  override def staticCall: String =
    "graft.functions.Coordinates.formatCoordinateScala"
  override def eval(s: String): String = Coordinates.formatCoordinateScala(s)
  override def prettyName: String = "graft_format_coordinate"
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object NativeExpressions {
  /** Static single-arg bridge (the Scala default-arg method is not
    * directly callable from generated Java).
    */
  def fixWrappedNameStatic(s: String): String = Cleanse.fixWrappedNameScala(s)

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Column builders over the native nodes. */
  def normalizeWords(c: Column): Column = col(NormalizeWordsExpr(expr(c)))
  def fixWrappedName(c: Column): Column = col(FixWrappedNameExpr(expr(c)))
  def formatCoordinate(c: Column): Column = col(FormatCoordinateExpr(expr(c)))
}
