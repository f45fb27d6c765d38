package graft.ops

import graft.SparkSpec

class EvalMetricsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def counts(rows: Seq[(Long, String, String)], n: Int) =
    EvalMetrics.rougeNCounts(
      rows.toDF("pair_id", "cand_text", "ref_text"), n)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("clipped bigram overlap: repeats cap at the reference count") {
    // cand "a b a b a b" has bigrams {a b: 3, b a: 2};
    // ref "a b c a b" has {a b: 2, b c: 1, c a: 1}
    // overlap = min(3,2) for "a b" + 0 for "b a" = 2
    assert(counts(Seq((1L, "a b a b a b", "a b c a b")), n = 2) ==
      Seq((1L, 2L, 5L, 4L)))
  }

  test("identical texts give overlap = totals; disjoint texts give 0") {
    assert(counts(Seq(
      (1L, "x y z", "x y z"),
      (2L, "p q r", "x y z")), n = 2) ==
      Seq((1L, 2L, 2L, 2L), (2L, 0L, 2L, 2L)))
  }

  test("normalization applies: case and whitespace fold before grams") {
    assert(counts(Seq((1L, "  A   b ", "a B")), n = 2) ==
      Seq((1L, 1L, 1L, 1L)))
  }

  test("short and empty sides contribute zero grams but keep the " +
      "pair in the universe") {
    assert(counts(Seq(
      (1L, "solo", "a b c"), // cand has no bigram
      (2L, "", ""),          // nothing anywhere
      (3L, "a b", "")), n = 2) ==
      Seq((1L, 0L, 0L, 2L), (2L, 0L, 0L, 0L), (3L, 0L, 1L, 0L)))
  }

  test("unigram mode (n = 1) is plain clipped token overlap") {
    assert(counts(Seq((1L, "a a b z", "a b b c")), n = 1) ==
      Seq((1L, 2L, 4L, 4L))) // min(2,1) for a + min(1,2) for b
  }

  test("model-parity fuzz: Spark == plain-Scala clipped counts on a " +
      "tiny-vocab corpus (fixed seed)") {
    // a 5-token alphabet makes repeated n-grams the NORM, so the
    // min() clipping is exercised on nearly every gram
    val rnd = new scala.util.Random(16L)
    def text() = Seq.fill(rnd.nextInt(30))("abcde"(rnd.nextInt(5)))
      .mkString(" ")
    val rows = (0L until 80L).map(i => (i, text(), text()))
    def grams(s: String, n: Int): Map[Seq[String], Int] = {
      val tk = s.split(" ").filter(_.nonEmpty).toSeq
      if (tk.length < n) Map.empty
      else tk.sliding(n).map(_.toSeq).toSeq.groupBy(identity)
        .map { case (g, o) => g -> o.size }
    }
    for (n <- Seq(1, 2, 3)) {
      val model = rows.map { case (id, c, r) =>
        val (gc, gr) = (grams(c, n), grams(r, n))
        val overlap = gc.map { case (g, k) =>
          math.min(k, gr.getOrElse(g, 0)) }.sum.toLong
        (id, overlap, gc.values.sum.toLong, gr.values.sum.toLong)
      }
      assert(counts(rows, n) == model, s"parity broke at n=$n")
    }
  }
}
