package graft.ops

import graft.SparkSpec
import graft.functions.UnigramModel
import org.apache.spark.unsafe.types.UTF8String

/** Parity pins for the unigram-LM trainer + Viterbi encode (VERDICT
  * r19 #6): an independent naive reference (exact Fractions via
  * BigInt pairs, plain collections, no shared code with
  * [[UnigramLm]]/[[UnigramModel]]) re-derives the model and the
  * segmentations; hand-written fixtures pin each tie-break rule
  * separately.
  */
class UnigramLmSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val vocab = Seq("the", "qxz", "ababab", "zzz", "thethe")
  private def plantedText(d: Int): String =
    (0 until (5 + d % 7)).map(j => vocab((d + j) % 5)).mkString(" ")
  private def plantedDocs(n: Int) =
    (0 until n).map(d => (d.toLong, plantedText(d))).toDF("doc_id", "text")
  private def plantedWordCounts(n: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]()
    (0 until n).foreach { d =>
      (0 until (5 + d % 7)).foreach { j =>
        val w = vocab((d + j) % 5)
        m(w) = m.getOrElse(w, 0L) + 1L
      }
    }
    m.toMap
  }

  // ---- naive reference ------------------------------------------------
  /** Naive Viterbi over a (piece -> count) map: enumerate ALL
    * segmentations recursively (words here are short), score each as
    * (nUnk, exact probability, nPieces, last-piece length) and pick
    * the best — brute force, no DP, so a DP bug cannot hide in both
    * implementations.
    */
  private def naiveSegment(
      w: String, m: Map[String, Long], maxLen: Int): List[String] = {
    val total = BigInt(m.values.foldLeft(BigInt(0))(_ + _).toString)
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val p = s.substring(0, l)
        if (m.contains(p) || l == 1)
          segs(s.substring(l)).map(p :: _)
        else Seq.empty
      }
    def score(seg: List[String]): (Int, BigInt, Int, Int) = {
      val nUnk = seg.count(p => !m.contains(p))
      val num = seg.foldLeft(BigInt(1))((acc, p) =>
        acc * BigInt(m.getOrElse(p, 1L)))
      (nUnk, num, seg.length, seg.last.length)
    }
    segs(w).minBy { s =>
      val (u, num, k, ll) = score(s)
      // order: fewer unk, higher num/total^k, fewer pieces, longer
      // last — rendered comparable by scoring against a fixed common
      // denominator total^w.length (k <= len always)
      (u, -(num * total.pow(w.length - k)), k, -ll)
    }(Ordering.by(identity[(Int, BigInt, Int, Int)]))
  }

  private def naiveTrain(
      wc: Map[String, Long], maxLen: Int, seedSize: Int,
      vocabSize: Int, emRounds: Int): Map[String, Long] = {
    val seed = scala.collection.mutable.Map[String, Long]()
    wc.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - i)) {
        val p = w.substring(i, i + l)
        seed(p) = seed.getOrElse(p, 0L) + c
      }
    }
    val chars = seed.filter(_._1.length == 1).toMap
    def top(m: Map[String, Long], k: Int) =
      m.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(k).toMap
    var model = chars ++ top(seed.toMap, seedSize)
    def estep(m: Map[String, Long]): Map[String, Long] = {
      val cnt = scala.collection.mutable.Map[String, Long]()
      wc.foreach { case (w, c) =>
        naiveSegment(w, m, maxLen).foreach(p =>
          cnt(p) = cnt.getOrElse(p, 0L) + c)
      }
      m.flatMap { case (p, _) =>
        val n = cnt.getOrElse(p, 0L)
        if (p.length == 1) Some((p, math.max(1L, n)))
        else if (n > 0) Some((p, n)) else None
      }
    }
    (1 to emRounds).foreach(_ => model = estep(model))
    val kept = top(model, vocabSize).keySet
    model = model.filter { case (p, _) => p.length == 1 || kept(p) }
    estep(model)
  }

  // ---- pins -----------------------------------------------------------

  test("hand fixtures: each Viterbi tie-break rule separately") {
    // probability beats piece count: model {ab:1, a:8, b:8}, T=17 —
    // [a,b] scores 64/289 > [ab] 1/17 → 2 pieces win on PROBABILITY
    val m1 = new UnigramModel(Map("ab" -> 1L, "a" -> 8L, "b" -> 8L), 4)
    assert(m1.segment("ab") == List("a", "b"))
    // and in the other direction: {ab:4, a:2, b:2}, T=8 —
    // [ab] 4/8 beats [a,b] 4/64 → the single piece wins
    val m2 = new UnigramModel(Map("ab" -> 4L, "a" -> 2L, "b" -> 2L), 4)
    assert(m2.segment("ab") == List("ab"))
    // longer LAST piece on full ties: {ab:2, a:2, b:2, aba:2, bab:2},
    // "abab" → [ab,ab] vs [a,bab] vs [aba,b]: all k=2, num=4 →
    // longer last piece (bab, len 3) wins → [a,bab]
    val m3 = new UnigramModel(
      Map("ab" -> 2L, "a" -> 2L, "b" -> 2L, "aba" -> 2L, "bab" -> 2L), 4)
    assert(m3.segment("abab") == List("a", "bab"))
    // unknown chars: fewer unknowns dominate any probability —
    // {q:1, xy:9}: "qxy" → [q,xy] (0 unk) even though [q,x,y] would
    // never be considered; "zq" → [z,q] with z unknown, 2 tokens
    val m4 = new UnigramModel(Map("q" -> 1L, "xy" -> 9L), 4)
    assert(m4.segment("qxy") == List("q", "xy"))
    assert(m4.segment("zq") == List("z", "q"))
    assert(m4.countTokens(UTF8String.fromString("qxy zq")) == 4L)
  }

  test("model parity: engine trainer == naive reference on the " +
      "planted corpus (pieces AND counts)") {
    val engine = UnigramLm.trainLocal(plantedDocs(500))
    val naive = naiveTrain(plantedWordCounts(500),
      maxLen = 4, seedSize = 16, vocabSize = 8, emRounds = 2)
    assert(engine.pieces == naive, s"engine=${engine.pieces
      .toSeq.sortBy(_._1)} naive=${naive.toSeq.sortBy(_._1)}")
    // the oracle's segmentations, pinned literally
    assert(engine.segment("the") == List("the"))
    assert(engine.segment("qxz") == List("qxz"))
    assert(engine.segment("ababab") == List("ab", "abab"))
    assert(engine.segment("zzz") == List("z", "zz"))
    assert(engine.segment("thethe") == List("the", "the"))
  }

  test("segment parity: engine Viterbi == brute-force enumeration " +
      "under the trained model, all planted words and composites") {
    val model = UnigramLm.trainLocal(plantedDocs(500))
    val m = model.pieces
    (vocab ++ Seq("thezzz", "ababthe", "qxzqxz", "zzzzz")).foreach { w =>
      assert(model.segment(w) == naiveSegment(w, m, 4),
        s"word $w: ${model.segment(w)} vs ${naiveSegment(w, m, 4)}")
    }
  }

  test("vocab bound discipline: the cap fails loudly") {
    val e = intercept[IllegalArgumentException] {
      UnigramLm.trainLocal(plantedDocs(500), maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
  }
}
