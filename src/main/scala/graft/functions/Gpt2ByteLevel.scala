package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graftbridge.ColumnBridge

/** GPT-2 BYTE-LEVEL pre-tokenization (VERDICT r18 stretch #8): the
  * published tokenizer does not merge over whitespace-split words —
  * it splits text with a fixed regex (contractions, letter runs,
  * digit runs, punctuation runs, whitespace), maps each pretoken's
  * UTF-8 BYTES through a reversible byte↔unicode table (space →
  * `Ġ` U+0120, newline → `Ċ` U+010A, …), and priority-merges INSIDE
  * each mapped pretoken. Both mechanics are public (the GPT-2 paper
  * §2.2 and the released `encoder.py`); this module reimplements
  * them over the engine's own [[BpeMergeTable]] automaton so an
  * imported `merges.txt` counts tokens the way its publisher does —
  * leading-space tokens (`Ġthe`) and bare tokens (`the`) are
  * DIFFERENT symbols, which is exactly where the engine's
  * normText-words approximation diverged (documented at
  * [[graft.ops.BpeMiner.encodeWithImportedMerges]]; this path closes
  * that gap rather than documenting it).
  *
  * Scale shape: identical to the flat encode — one codegen'd
  * expression node holding the table reference object, per-row work
  * `O(len · merges-that-fire)`, zero joins, zero driver state.
  */
object Gpt2ByteLevel {

  /** The reversible byte→unicode map of GPT-2's `bytes_to_unicode`:
    * printable/latin bytes (`!`..`~`, `¡`..`¬`, `®`..`ÿ`) map to
    * themselves; the remaining 68 bytes map, in ascending order, to
    * U+0100 + n. Space (0x20) lands on U+0120 `Ġ`, tab on U+0109
    * `ĉ`, newline on U+010A `Ċ` — the published markers.
    */
  val ByteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    def printable(b: Int): Boolean =
      (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }

  /** The GPT-2 split pattern (contractions | optionally-space-led
    * letter/digit/punctuation runs | whitespace; `\s+(?!\S)` keeps
    * trailing whitespace separate from a following token's leading
    * space). `UNICODE_CHARACTER_CLASS` makes `\p{L}`/`\p{N}`/`\s`
    * match the Unicode categories the published Python `regex`
    * pattern uses.
    *
    * Known divergence (ADVICE r19): Java's
    * `UNICODE_CHARACTER_CLASS` APPROXIMATES the Python `regex`
    * module's category semantics — they disagree on a handful of
    * codepoints (notably edges of the `\s` category such as
    * U+0085 NEL and some format/separator characters), so token
    * counts on non-ASCII corpora can differ slightly from the
    * publisher's tokenizer. The gated ASCII corpus is exact; treat
    * non-ASCII parity as approximate rather than bit-for-bit.
    */
  private val SplitPattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** Pretokens of `text` in order — the regex's successive matches
    * (they tile the input: every branch consumes at least one char
    * and the alternation covers all of them).
    */
  def preTokenize(text: String): Seq[String] = {
    val m = SplitPattern.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One pretoken → its byte-mapped symbol string. */
  def toByteSymbols(pretoken: String): String = {
    val bytes = pretoken.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ByteToChar(bytes(i) & 0xFF)
      i += 1
    }
    new String(out)
  }

  /** Byte-level token COUNT of `text` under `table`: pretokenize →
    * byte-map → priority-merge each pretoken independently (merges
    * never cross pretoken boundaries — the published contract).
    */
  def countTokens(text: UTF8String, table: BpeMergeTable): Long = {
    val m = SplitPattern.matcher(text.toString)
    var n = 0L
    while (m.find()) {
      val sym = toByteSymbols(m.group())
      // byte-mapped chars are all BMP (< 0x180), so length == symbols
      val ids = new Array[Int](sym.length)
      var i = 0
      while (i < sym.length) { ids(i) = sym.charAt(i); i += 1 }
      n += table.mergeSpan(ids, ids.length)
    }
    n
  }

  /** `gpt2_count(text)` column over a byte-level merge table. */
  def count(text: Column, table: BpeMergeTable): Column =
    ColumnBridge.column(
      Gpt2CountExpr(ColumnBridge.expression(text), table))
}

/** `string` (RAW text — byte-level pre-tokenization does its own
  * segmentation; no normText upstream) → `bigint` byte-level token
  * count under an imported merge table. The codegen'd sibling of
  * [[BpeCountExpr]] for the published-tokenizer dialect.
  */
case class Gpt2CountExpr(child: Expression, table: BpeMergeTable)
    extends UnaryExpression with GraftTypeChecks {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    requireTypes((child.dataType, "a string argument", isString))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_gpt2_count"
  override def nullSafeEval(input: Any): Any =
    Gpt2ByteLevel.countTokens(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Gpt2ByteLevel.countTokens($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
