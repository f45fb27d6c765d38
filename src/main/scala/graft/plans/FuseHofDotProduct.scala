package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import graft.functions.DotProductExpr

/** Optimizer rule: rewrite the composed higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v) }}}
  *
  * over two FLOAT-array columns into the single fused codegen'd loop
  * [[graft.functions.DotProductExpr]]. The HOF chain is how a user
  * naturally writes a dot product with built-ins (and how
  * [[graft.ops.Similarity.dot]] writes it); it is semantically exact
  * but materializes the zipped product array per row and folds it
  * through the interpreted lambda path (`ArrayAggregate` is
  * `CodegenFallback`). The fused node is one loop in generated Java
  * with no intermediate allocation — the rewrite is what makes the
  * LSH bucket assignment (numBits dot products per row) codegen-clean
  * without users having to know about the native expression.
  *
  * The match is deliberately narrow so the rewrite is bit-exact:
  *  - both arrays are `array<float>` (the embedding contract);
  *  - the zip lambda is exactly `x * y` over its two variables (either
  *    operand order) — FLOAT multiply, widened on accumulation;
  *  - the seed is literal double `0.0`;
  *  - the merge lambda is `acc + v` (modulo the implicit
  *    `cast(v as double)` the analyzer inserts, either operand order);
  *  - the finish lambda is the identity.
  * Anything else (double arrays, a cast inside the multiply, a nonzero
  * seed, min/max folds) keeps its built-in plan. Null semantics are
  * preserved exactly: mismatched lengths or a null element poison the
  * fold to NULL in both formulations, and an empty pair of arrays
  * yields the 0.0 seed.
  *
  * Registered by [[graft.GraftExtensions]] both at session build
  * (`injectOptimizerRule`) and post-hoc (`experimental
  * .extraOptimizations`); idempotent because the rewritten tree no
  * longer contains the `ArrayAggregate` pattern.
  */
object FuseHofDotProduct extends Rule[LogicalPlan] {

  /** Lambda-variable occurrence, matched by exprId. */
  private object Var {
    def unapply(e: Expression): Option[ExprId] = e match {
      case v: NamedLambdaVariable => Some(v.exprId)
      case _ => None
    }
  }

  private def varId(ne: NamedExpression): Option[ExprId] = ne match {
    case v: NamedLambdaVariable => Some(v.exprId)
    case _ => None
  }

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** `x * y` over exactly the two lambda variables, either order. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(Var(l), Var(r), _), args, _) =>
      args.flatMap(varId) match {
        case Seq(x, y) => (l == x && r == y) || (l == y && r == x)
        case _ => false
      }
    case _ => false
  }

  /** Strip the analyzer's widening cast-to-double, if present. */
  private def stripDoubleCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => c
    case other => other
  }

  /** `(acc, v) => acc + v` modulo the implicit elem→double cast. */
  private def isAccumulate(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), args, _) =>
      (args.flatMap(varId),
        stripDoubleCast(l), stripDoubleCast(r)) match {
        case (Seq(acc, v), Var(a), Var(b)) =>
          (a == acc && b == v) || (a == v && b == acc)
        case _ => false
      }
    case _ => false
  }

  /** The default `aggregate` finish lambda: `acc => acc`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(Var(body), args, _) =>
      args.flatMap(varId) == Seq(body)
    case _ => false
  }

  /** Literal +0.0 exactly — a `case Literal(0.0d, _)` constant pattern
    * also matches -0.0 (numeric equality), and a -0.0 seed yields -0.0
    * for empty arrays where the fused node yields +0.0.
    */
  private def isPositiveZero(e: Expression): Boolean = e match {
    case Literal(d: java.lang.Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, product), zero, merge, finish)
          if isPositiveZero(zero) &&
            isFloatArray(a.dataType) && isFloatArray(b.dataType) &&
            isPairProduct(product) && isAccumulate(merge) &&
            isIdentity(finish) =>
        DotProductExpr(a, b)
    }
}
