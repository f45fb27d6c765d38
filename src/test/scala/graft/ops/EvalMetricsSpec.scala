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

  test("cohenKappa: hand-computed pieces; kappa exactly 0.4 is NOT " +
      "substantial (strict); degenerate raters give 0/0 and false") {
    import org.apache.spark.sql.functions.col
    def kappa(ab: (Int, Int)*) =
      EvalMetrics.cohenKappa(ab.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Long, Long, String, String, Boolean)]
        .head()

    // 4×(1,1), 3×(0,0), 2×(1,0), 1×(0,1): N=10, agree=7, a+=6, b+=5
    // chance = 6·5 + 4·5 = 50; num = 70−50 = 20; den = 100−50 = 50
    // κ = 0.4 exactly → NOT substantial under the strict inequality
    val boundary = kappa(Seq.fill(4)((1, 1)) ++ Seq.fill(3)((0, 0)) ++
      Seq.fill(2)((1, 0)) ++ Seq((0, 1)): _*)
    assert(boundary == (10L, 7L, 6L, 5L, "20", "50", false),
      boundary.toString)

    // 5×(1,1), 4×(0,0), 1×(1,0): agree=9 → num=40, den=50, κ=0.8
    val strong = kappa(Seq.fill(5)((1, 1)) ++ Seq.fill(4)((0, 0)) ++
      Seq((1, 0)): _*)
    assert(strong == (10L, 9L, 6L, 5L, "40", "50", true),
      strong.toString)

    // both raters constant: p_e = 1, num = den = 0 — κ undefined,
    // verdict stays false rather than erroring
    val degen = kappa((1, 1), (1, 1), (1, 1))
    assert(degen == (3L, 3L, 3L, 3L, "0", "0", false), degen.toString)
  }
}
