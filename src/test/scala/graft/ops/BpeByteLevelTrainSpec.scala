package graft.ops

import graft.SparkSpec
import graft.functions.{BpeMergeTable, Gpt2ByteLevel}
import org.apache.spark.unsafe.types.UTF8String

/** Rank-parity pins for the BYTE-LEVEL BPE trainer (VERDICT r19 #3):
  * an independent naive reference (plain string maps, no shared code
  * with [[BpeMiner.trainByteLevelMergesLocal]]) re-derives the merge
  * sequence over the same pretoken vocabulary, plus hand-written
  * fixtures small enough to verify on paper — including the
  * position-sensitive Ġ mechanic and the (l ASC, r ASC) tie-break
  * the oracle hand table depends on.
  */
class BpeByteLevelTrainSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  /** The planted imported-fertility corpus, reconstructed from its
    * published arithmetic (doc d: `5 + d % 7` words, word j =
    * vocab[(d + j) % 5]) — the spec's own derivation, not
    * SparkEntry's code.
    */
  private val vocab = Seq("the", "qxz", "ababab", "zzz", "thethe")
  private def plantedText(d: Int): String =
    (0 until (5 + d % 7)).map(j => vocab((d + j) % 5)).mkString(" ")
  private def plantedDocs(n: Int) =
    (0 until n).map(d => (d.toLong, plantedText(d))).toDF("doc_id", "text")

  /** Naive reference trainer: pretoken counts in, `(l, r, cnt)` merge
    * sequence out. Symbols as string lists; winner = max weighted
    * adjacent-pair count, ties by (l, r) ascending (String compareTo
    * == codepoint order on the byte-map char set); apply = leftmost
    * non-overlapping.
    */
  private def naiveTrain(
      pre: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
    var words: Map[String, (List[String], Long)] =
      pre.map { case (w, c) => (w, (w.map(_.toString).toList, c)) }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) =>
        (-c, l, r)
      }
      out += ((l, r, c))
      val prod = l + r
      words = words.map { case (w, (syms, cw)) =>
        val merged = scala.collection.mutable.ListBuffer[String]()
        var rest = syms
        while (rest.nonEmpty) {
          rest match {
            case a :: b :: tail if a == l && b == r =>
              merged += prod; rest = tail
            case a :: tail => merged += a; rest = tail
            case Nil => ()
          }
        }
        (w, (merged.toList, cw))
      }
    }
    out.result()
  }

  /** The planted corpus's pretoken vocabulary, derived independently:
    * GPT-2 pretokens of a space-joined word list are the first word
    * bare and every later word Ġ-prefixed.
    */
  private def plantedPretokens(n: Int): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]()
    (0 until n).foreach { d =>
      (0 until (5 + d % 7)).foreach { j =>
        val w = vocab((d + j) % 5)
        val tok = if (j == 0) w else "Ġ" + w
        m(tok) = m.getOrElse(tok, 0L) + 1L
      }
    }
    m.toMap.filter(_._1.length > 1)
  }

  test("hand fixture: Ġ makes first-vs-rest different symbols and " +
      "the tie-break is (l, r) codepoint order") {
    // corpus "ab ab" ×1: pretokens ab×1, Ġab×1.
    // r1 pairs: (a,b)=2, (Ġ,a)=1 → (a,b,2); apply → [ab], [Ġ,ab]
    // r2 pairs: (Ġ,ab)=1 → (Ġ,ab,1)
    val got = BpeMiner.trainByteLevelMergesLocal(
      Seq((0L, "ab ab")).toDF("doc_id", "text"), rounds = 2).toSeq
    assert(got == Seq(("a", "b", 2L), ("Ġ", "ab", 1L)),
      got.toString)
    // tie fixture: "xy yz" → pretokens xy, Ġyz; pairs (x,y)=1,
    // (Ġ,y)=1, (y,z)=1 → Ġ (U+0120) sorts ABOVE ascii, so (x,y) wins
    val tie = BpeMiner.trainByteLevelMergesLocal(
      Seq((0L, "xy yz")).toDF("doc_id", "text"), rounds = 1).toSeq
    assert(tie == Seq(("x", "y", 1L)), tie.toString)
  }

  test("rank parity: engine trainer == naive reference on the " +
      "planted corpus, all 8 rounds, counts included") {
    val engine = BpeMiner.trainByteLevelMergesLocal(
      plantedDocs(500), rounds = 8).toSeq
    val naive = naiveTrain(plantedPretokens(500), rounds = 8)
    assert(engine == naive, s"engine=$engine naive=$naive")
    // the derivation the oracle hand table quotes, pinned literally —
    // rounds 7-8 win a four-way 799 tie on (l, r) ascending
    assert(engine == Seq(
      ("h", "e", 2397L), ("t", "he", 2397L), ("a", "b", 2394L),
      ("z", "z", 1598L), ("ab", "ab", 1596L),
      ("Ġ", "the", 1398L), ("q", "x", 799L), ("qx", "z", 799L)),
      engine.toString)
  }

  test("trained table reproduces the oracle's position-sensitive " +
      "hand counts through the real byte-level encode") {
    val table = BpeMiner.byteLevelTableFor(plantedDocs(500), rounds = 8)
    def count(text: String): Long =
      Gpt2ByteLevel.countTokens(UTF8String.fromString(text), table)
    // (word, tok_first, tok_rest): encode "w" vs the rest position
    // inside "w w" (total minus the first word's count)
    val hand = Seq(
      ("the", 1L, 1L), ("qxz", 1L, 2L), ("ababab", 2L, 3L),
      ("zzz", 2L, 3L), ("thethe", 2L, 2L))
    hand.foreach { case (w, first, rest) =>
      assert(count(w) == first, s"$w first: ${count(w)} != $first")
      assert(count(s"$w $w") - first == rest,
        s"$w rest: ${count(s"$w $w") - first} != $rest")
    }
  }

  test("vocab bound discipline: the cap fails loudly, the floor " +
      "drops sub-minCount pretokens") {
    val e = intercept[IllegalArgumentException] {
      BpeMiner.trainByteLevelMergesLocal(
        plantedDocs(500), rounds = 2, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    // minCount above every bare-word count (100) trains on the
    // Ġ vocabulary only: (h,e) drops to 699 + 2*699 = 2097
    val floored = BpeMiner.trainByteLevelMergesLocal(
      plantedDocs(500), rounds = 1, minCount = 200L).toSeq
    assert(floored == Seq(("h", "e", 2097L)), floored.toString)
  }
}
