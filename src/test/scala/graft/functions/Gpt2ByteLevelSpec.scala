package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the GPT-2 byte-level pre-tokenization mechanics (paper §2.2 /
  * released encoder semantics) against hand computations: the
  * byte→unicode table's published markers, the split regex's tiling,
  * and the Ġ-prefix count divergence the byte dialect exists for.
  */
class Gpt2ByteLevelSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def fixtureTable = BpeMergeTable.fromSymbolMerges(
    graft.ops.BpeMiner.loadMergesResource(
      "/graft/merges_fixture_bytelevel.txt"))

  test("byte->unicode table: published markers and self-mapped " +
      "printables") {
    val t = Gpt2ByteLevel.ByteToChar
    assert(t(' ') == 'Ġ') // Ġ
    assert(t('\t') == 'ĉ') // ĉ
    assert(t('\n') == 'Ċ') // Ċ
    assert(t(0) == 'Ā')
    assert(t('A') == 'A' && t('!') == '!' && t('~') == '~')
    assert(t(0xAD) == 'Ń') // soft hyphen, the 68th missing byte
    // reversible: 256 distinct images
    assert(t.distinct.length == 256)
  }

  test("split regex tiles text into the published pretoken classes") {
    assert(Gpt2ByteLevel.preTokenize("Hello world's fun!") ==
      Seq("Hello", " world", "'s", " fun", "!"))
    assert(Gpt2ByteLevel.preTokenize("a1 b2") ==
      Seq("a", "1", " b", "2")) // letter and digit runs split
    assert(Gpt2ByteLevel.preTokenize("hi  there ") ==
      Seq("hi", " ", " there", " ")) // \s+(?!\S) keeps one space for
    // the next token, surplus whitespace stands alone
    // tiling: concatenation of pretokens == input
    val s = "We've 42 cats — naïve, right?\n"
    assert(Gpt2ByteLevel.preTokenize(s).mkString == s)
  }

  test("toByteSymbols: multibyte UTF-8 maps byte-by-byte") {
    // é = C3 A9; C3 self-maps ('Ã'), A9 self-maps ('©')
    assert(Gpt2ByteLevel.toByteSymbols("é") == "Ã©")
    assert(Gpt2ByteLevel.toByteSymbols(" a") == "Ġa")
  }

  test("byte-level counts match the fixture's hand derivations, " +
      "including the first-word/leading-space divergence") {
    val t = fixtureTable
    def cnt(s: String): Long = Gpt2ByteLevel.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), t)
    // per-word: first occurrence bare, later ones carry Ġ
    assert(cnt("the") == 1L)
    assert(cnt("the the") == 2L) // the + Ġthe, both 1
    assert(cnt("qxz") == 1L)
    assert(cnt("qxz qxz") == 3L) // qxz(1) + [Ġ, qxz](2)
    assert(cnt("the qxz ababab zzz thethe") == 1 + 2 + 3 + 4 + 2)
    // and through the codegen'd Column path
    val got = Seq((1L, "the qxz ababab zzz thethe"), (2L, "zzz the"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Gpt2ByteLevel.count(col("text"), t).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 12L, 2L -> 4L), got.toString)
  }
}
