package graft.ops

import graft.SparkSpec

/** Hand-computed BPE merge-mining pins: weighted pair counts, the
  * leftmost-non-overlapping apply, placeholder expansion, tie order.
  */
class BpeMinerSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def merges(texts: Seq[String], rounds: Int) =
    BpeMiner.topMerges(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      rounds)
      .as[(Long, String, String, Long)].collect().toSeq

  test("three rounds on a hand-computed vocabulary") {
    // vocab: "abab"×2, "abc"×1
    // r1 pairs: ab = 2·2+1 = 5, ba = 2, bc = 1 → merge (a,b,5)
    //   apply: abab→⟨P1⟩⟨P1⟩, abc→⟨P1⟩c
    // r2 pairs: (P1,P1) = 2, (P1,c) = 1 → merge (ab,ab,2)
    //   apply: ⟨P1⟩⟨P1⟩→⟨P2⟩ (single symbol, no pairs left)
    // r3 pairs: (P1,c) = 1 → merge (ab,c,1)
    val got = merges(Seq("abab abab", "abc"), rounds = 3)
    assert(got == Seq(
      (1L, "a", "b", 5L),
      (2L, "ab", "ab", 2L),
      (3L, "ab", "c", 1L)), got.toString)
  }

  test("count ties break by (left, right) byte order") {
    // xy and yz both appear once → (x,y) wins on the left symbol
    assert(merges(Seq("xy yz"), rounds = 1) ==
      Seq((1L, "x", "y", 1L)))
  }

  test("the apply is leftmost-non-overlapping: aaa collapses to Xa") {
    // vocab "aaa"×1: r1 pair (a,a) counts BOTH adjacencies (2), the
    // apply rewrites leftmost-first to ⟨P1⟩a, so r2's top pair is
    // (aa, a) with count 1 — the replace-all convention both engines
    // share scans left to right without overlap
    val got = merges(Seq("aaa"), rounds = 2)
    assert(got == Seq(
      (1L, "a", "a", 2L),
      (2L, "aa", "a", 1L)), got.toString)
  }

  test("compressionSummary: weighted symbol counts before and after") {
    // vocab abab×2 abc×1 → before = 2·4 + 1·3 = 11; after three
    // merges (ab, abab, abc) every word is ONE symbol → after = 3
    val df = Seq((1L, "abab abab"), (2L, "abc")).toDF("doc_id", "text")
    val got = BpeMiner.compressionSummary(df, rounds = 3)
      .as[(Long, Long, Double)].collect().head
    assert(got == ((11L, 3L, 11.0 / 3.0)), got.toString)
  }

  test("normalization feeds the vocabulary: case folds, spaces collapse") {
    // "AB  ab" → tokens ab, ab → vocab ab×2 → merge (a,b,2)
    assert(merges(Seq("AB  ab"), rounds = 1) ==
      Seq((1L, "a", "b", 2L)))
  }
}
