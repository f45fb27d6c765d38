package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ColumnBridge

/** A trained unigram-LM tokenizer model: piece → count, Viterbi
  * segmentation maximizing the EXACT rational probability
  * Π count(pᵢ) / T^k (T = Σ model counts), compared by BigInt
  * cross-multiplication — no floats anywhere, so segmentations (and
  * the oracle hand tables built on them) are bit-deterministic
  * across JVMs. Tie order, pinned (and replayed by the parity
  * spec's naive reference): fewer unknown chars, higher probability,
  * fewer pieces, longer LAST piece. Chars absent from the model
  * segment as single-char unknowns (each still a token).
  *
  * The model is a driver-built reference object carried into the
  * codegen'd [[UnigramCountExpr]] — model-sized (≤ seed/vocab caps),
  * broadcast with the plan, zero joins at encode time.
  */
final class UnigramModel(
    val pieces: Map[String, Long],
    val maxPieceLen: Int) extends Serializable {
  require(pieces.nonEmpty, "unigram model must be non-empty")
  require(pieces.values.forall(_ >= 1L),
    "unigram piece counts must be >= 1")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  @transient private lazy val totalB: BigInt =
    pieces.values.foldLeft(BigInt(0))(_ + _)

  /** Viterbi segmentation of one word under the pinned tie order. */
  def segment(word: String): List[String] = {
    val n = word.length
    if (n == 0) return Nil
    val unk = new Array[Int](n + 1)
    val num = new Array[BigInt](n + 1)
    val kk = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    val ok = new Array[Boolean](n + 1)
    val pow = new Array[BigInt](n + 1)
    pow(0) = BigInt(1)
    var i = 1
    while (i <= n) { pow(i) = pow(i - 1) * totalB; i += 1 }
    ok(0) = true
    num(0) = BigInt(1)
    i = 1
    while (i <= n) {
      val maxL = math.min(maxPieceLen, i)
      var l = 1
      while (l <= maxL) {
        val start = i - l
        if (ok(start)) {
          val p = word.substring(start, i)
          val cnt = pieces.getOrElse(p, 0L)
          if (cnt > 0L || l == 1) {
            val cu = if (cnt > 0L) unk(start) else unk(start) + 1
            val cn = if (cnt > 0L) num(start) * cnt else num(start)
            val ck = kk(start) + 1
            val better = !ok(i) || cu < unk(i) || (cu == unk(i) && {
              val cmp = (cn * pow(kk(i))).compare(num(i) * pow(ck))
              cmp > 0 || (cmp == 0 &&
                (ck < kk(i) || (ck == kk(i) && l > lastLen(i))))
            })
            if (better) {
              ok(i) = true
              unk(i) = cu; num(i) = cn; kk(i) = ck; lastLen(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // every position is reachable (l == 1 always applies), so walk
    // the lastLen backpointers
    var out = List.empty[String]
    i = n
    while (i > 0) {
      val l = lastLen(i)
      out = word.substring(i - l, i) :: out
      i -= l
    }
    out
  }

  /** Token count of one word — the Viterbi piece count. */
  def countWord(word: String): Long = segment(word).length.toLong

  /** Token count of NORMALIZED text (single-space separated): the
    * sum of per-word Viterbi counts.
    */
  def countTokens(text: UTF8String): Long = {
    val s = text.toString
    var n = 0L
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) n += countWord(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    n
  }
}

/** Column factories for unigram-LM encode. */
object UnigramExprs {

  /** `unigram_count(text)` over a trained model — NORMALIZED text in
    * ([[graft.ops.TextDedup.normText]]'s contract), `bigint` token
    * count out; one codegen'd node at any vocabulary size.
    */
  def countTokens(text: Column, model: UnigramModel): Column =
    ColumnBridge.column(
      UnigramCountExpr(ColumnBridge.expression(text), model))
}

/** `string` → `bigint` unigram-LM token count; the codegen'd sibling
  * of [[BpeCountExpr]]/[[Gpt2CountExpr]] on the unigram axis.
  */
case class UnigramCountExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression with GraftTypeChecks {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireTypes((child.dataType, "a string argument", isString))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_unigram_count"
  override def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
