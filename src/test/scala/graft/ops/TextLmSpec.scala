package graft.ops

import graft.SparkSpec

/** Hand-computed fixtures for the KN-backoff LM filter and the
  * integer readability scores — every expected value derived on
  * paper, every assertion exact.
  */
class TextLmSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("knPerplexity: seen / backoff / oov bigrams cost the " +
      "documented exact bits") {
    // reference "a b a b a c": counts (a,b)=2 (b,a)=2 (a,c)=1;
    // c_prev a=3 b=2; n1p_left a=1 b=1 c=1; types=3
    val ref = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    val tgt = Seq(
      (1L, "a b c a"), // (a,b) seen; (b,c),(c,a) backoff
      (2L, "a z")) // (a,z): z never continues anything -> oov
      .toDF("doc_id", "text")
    val got = TextAnalysis.knPerplexity(tgt, ref)
      .as[(Long, Boolean, Long, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // (a,b): len(bin(3 div 2)) = 1; backoffs: len(bin(3 div 1)) + 2
    // = 4 each -> kn_bits = 1 + 4 + 4 = 9; keep: 90 <= 56*3
    assert(got(1L) == ((1L, true, 3L, 1L, 2L, 0L, 9L, 1)),
      got(1L).toString)
    // oov: 24 bits on 1 bigram; keep: 240 > 56
    assert(got(2L) == ((2L, true, 1L, 0L, 0L, 1L, 24L, 0)),
      got(2L).toString)
  }

  test("knPerplexity: a frequent in-context bigram is cheaper than a " +
      "rare one under the same context") {
    // "x a x a x a x b": (x,a)=3 (a,x)=3 (x,b)=1; c_prev x=4
    val ref = Seq((0L, "x a x a x a x b")).toDF("doc_id", "text")
    val tgt = Seq((1L, "x a"), (2L, "x b")).toDF("doc_id", "text")
    val bits = TextAnalysis.knPerplexity(tgt, ref)
      .as[(Long, Boolean, Long, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r._7).toMap
    // (x,a): len(bin(4 div 3)) = 1; (x,b): len(bin(4 div 1)) = 3
    assert(bits(1L) == 1L && bits(2L) == 3L, bits.toString)
  }

  test("readability: word / sentence / vowel-run counts and the two " +
      "cross-multiplied milli scores") {
    val docs = Seq((1L, "The cat sat. It ran fast!"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs)
      .as[(Long, Boolean, Long, Long, Long, Long, Long, String)]
      .collect().head
    // W=6, S=2, Y=6: flesch = 206835 - (1015*36 + 84600*12) div 12 =
    // 119190; fk = (390*36 + 11800*12) div 12 - 15590 = -2620
    assert(got == ((1L, true, 6L, 2L, 6L, 119190L, -2620L, "very_easy")),
      got.toString)
  }

  test("readability: no terminal punctuation floors sentences at 1; " +
      "empty text drops") {
    val docs = Seq((1L, "word soup with no end"), (2L, "   "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs)
      .as[(Long, Boolean, Long, Long, Long, Long, Long, String)].collect()
    assert(got.length == 1 && got.head._4 == 1L, got.toList.toString)
  }

  test("readability: dense long-word text lands in a harder band " +
      "than simple prose") {
    val docs = Seq(
      (1L, "I am ok. He is ok. We go up."),
      (2L, "Extraordinarily sophisticated considerations " +
        "notwithstanding, multidimensional organizational " +
        "harmonization presupposes interdisciplinary convergence."))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs)
      .as[(Long, Boolean, Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._8).toMap
    assert(got(1L) == "very_easy" && got(2L) == "very_hard",
      got.toString)
  }

  test("ws_tok_ok honesty flag: space-free-script documents are " +
      "flagged instead of silently mis-scored") {
    val docs = Seq(
      // plain latin prose — whitespace tokens are meaningful
      (1L, "the quick brown fox. it jumps over things!"),
      // Japanese (kana + kanji, CJK-punct sentence marks): every
      // whitespace-token metric would see ~1 giant "word" — flag it
      (2L, "今日は良い天気です" +
        "。 猫が好きです。"),
      // Korean hangul — same degeneration, different block
      (3L, "안녕하세요 세상."),
      // minority CJK inside latin prose — still space-tokenizable
      (4L, "mixed 中文 words with mostly latin text here."))
      .toDF("doc_id", "text")
    val expected = Map(1L -> true, 2L -> false, 3L -> false, 4L -> true)
    val viaReadability = TextAnalysis.readability(docs)
      .select("doc_id", "ws_tok_ok").as[(Long, Boolean)].collect().toMap
    assert(viaReadability == expected, viaReadability.toString)
    val viaGopher = TextAnalysis.gopherQualityFilter(docs)
      .select("doc_id", "ws_tok_ok").as[(Long, Boolean)].collect().toMap
    assert(viaGopher == expected, viaGopher.toString)
    // knPerplexity groups by the flag without changing the counts:
    // the two-token Japanese doc has ONE degenerate "bigram", and the
    // row says so in-band
    val viaKn = TextAnalysis.knPerplexity(docs, docs)
      .select("doc_id", "ws_tok_ok", "n_bigrams")
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaKn(2L) == ((false, 1L)), viaKn.toString)
    assert(viaKn(1L)._1 && viaKn(4L)._1, viaKn.toString)
  }

  test("fallbackTokenStats: char-level for ideographs, word-level " +
      "elsewhere, and latin prose degenerates to the whitespace count") {
    val docs = Seq(
      (1L, "en", "plain latin words here."),
      // 2 ws "tokens", but 9 kana/kanji chars + 2 CJK periods...
      // the periods 。 (U+3002) are OUTSIDE the ranges → they join
      // pieces; chars inside ranges count individually
      (2L, "ja", "今日は良い 天気です。"),
      // mixed: "ab中cd" → pieces "ab","cd" + 1 ideograph = 3
      (3L, "mix", "ab中cd plus words"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.fallbackTokenStats(docs)
      .as[(Long, String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // latin: pieces == ws tokens, zero class chars, fallback == ws
    assert(got(1L) == ((1L, "en", 4L, 4L, 0L, 4L, true)),
      got(1L).toString)
    // ja: ws tokens 2; class chars: 今日は良い(5) + 天気です(4) = 9;
    // pieces: the lone '。' after です = 1; fallback = 10; flagged
    assert(got(2L) == ((2L, "ja", 2L, 1L, 9L, 10L, false)),
      got(2L).toString)
    // mixed: ws 3; pieces ab,cd,plus,words = 4; class chars 1 → 5
    assert(got(3L) == ((3L, "mix", 3L, 4L, 1L, 5L, true)),
      got(3L).toString)
  }
}
