package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native fused SimHash: the whole 64-bit signature as one codegen'd
  * loop over the token array.
  *
  * The composed formulation in [[graft.ops.TextDedup]] — explode →
  * `xxhash64` → 64 conditional SUMs → sign reassembly — is
  * semantically exact and fully codegen'd, but it pays an explode
  * (one row per token occurrence), evaluates 64 branch-per-bit sum
  * updates per token ROW in the aggregate, and shuffles 64 longs per
  * document. This node computes the identical result with one static
  * call per row: hash each token once, update 64 running counts in a
  * local `int[]` (branchless: `(h >> b & 1) * 2 - 1`), take the sign
  * bits — no explode, no aggregate, no shuffle. A signature pass
  * becomes scan-shaped.
  *
  * Bit parity with the explode chain (spec-pinned, bit-for-bit):
  *  - token hash = `xxhash64(tok)` = `XXH64.hashUTF8String(tok, 42)`;
  *  - a NULL token contributes the bits of the bare seed 42 (Spark
  *    hash functions skip null children, leaving the seed);
  *  - duplicate tokens each contribute (the explode keeps the token
  *    MULTISET — this is deliberate: repetition shifts the sketch the
  *    same way it shifts the reference formulation);
  *  - bit b of the signature is set iff its ±1 count sum is > 0
  *    (ties at 0 give a 0 bit).
  */
object SimHashNative {

  def signature(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var k = 0
    while (k < n) {
      val h =
        if (tokens.isNullAt(k)) 42L
        else XXH64.hashUTF8String(tokens.getUTF8String(k), 42L)
      var b = 0
      while (b < 64) {
        counts(b) += (((h >> b) & 1L).toInt << 1) - 1
        b += 1
      }
      k += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** `array<string>` tokens → `bigint` 64-bit SimHash signature. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with GraftTypeChecks {
  override def prettyName: String = "graft_simhash"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireTypes((child.dataType, "an array<string> argument", isStringArray))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    SimHashNative.signature(a.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashNative.signature($c);")
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object SimHashExprs {
  def simHash(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))
}
