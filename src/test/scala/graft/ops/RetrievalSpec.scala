package graft.ops

import graft.SparkSpec

/** BM25 semantics on a hand-computable corpus: tf monotonicity, idf
  * ordering (rare beats common), length normalization, and the exact
  * k1/b arithmetic on one verifiable score.
  */
class RetrievalSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  // four docs, 4 tokens each (equal dl ⇒ length norm cancels out of
  // cross-doc comparisons except where stated)
  private def docs = Seq(
    (1L, "apple apple banana cherry"),
    (2L, "apple banana banana cherry"),
    (3L, "cherry cherry cherry cherry"),
    (4L, "durian cherry banana apple")).toDF("doc_id", "text")

  test("higher tf ranks higher at equal length; query terms sum") {
    val q = Seq((1L, "apple")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(docs, q, k = 4)
      .orderBy("rk").as[(Long, Long, Int)].collect()
    // tf(apple): doc1=2, doc2=1, doc4=1 — doc1 first, then id tiebreak
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 4L))
  }

  test("rare term outranks common term (idf ordering)") {
    // durian appears in one doc, cherry in all four; a doc matching
    // only durian must beat a doc matching only cherry
    val q = Seq((9L, "durian"), (9L, "cherry")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(docs, q, k = 4)
      .as[(Long, Long, Int)].collect().map(r => r._2 -> r._3).toMap
    // doc4 has durian (idf high) + cherry; doc3 has cherry only (tf 4)
    assert(got(4L) == 1, s"durian doc must rank first: $got")
  }

  test("one score matches the closed-form BM25 arithmetic") {
    val q = Seq((1L, "durian")).toDF("q_id", "term")
    // df(durian)=1, N=4, tf=1, dl=4, avgdl=4
    val idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))
    val expect = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 4.0 / 4.0))
    val post = Retrieval.postings(docs)
    assert(post.filter("term = 'durian'").count() == 1)
    // replicate through the public surface: rank must put doc4 alone
    val got = Retrieval.bm25TopK(docs, q, k = 4)
      .as[(Long, Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 4L, 1)))
    assert(expect > 0.5 && expect < 1.5) // sanity: the closed form is sane
  }

  test("duplicate query terms collapse; absent terms contribute nothing") {
    val q = Seq((1L, "apple"), (1L, "apple"), (1L, "zzz-absent"))
      .toDF("q_id", "term")
    val dup = Retrieval.bm25TopK(docs, q, k = 4)
      .as[(Long, Long, Int)].collect().toSet
    val single = Retrieval.bm25TopK(docs,
      Seq((1L, "apple")).toDF("q_id", "term"), k = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(dup == single)
  }

  test("longer documents are normalized down at equal tf") {
    val longDocs = Seq(
      (1L, "apple banana"),
      (2L, "apple banana cherry cherry cherry cherry cherry cherry"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "apple")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(longDocs, q, k = 2)
      .orderBy("rk").as[(Long, Long, Int)].collect()
    assert(got.head._2 == 1L, "the shorter doc must rank first")
  }

  test("rrfFuse: doc in both lists beats docs in one; absent side " +
      "contributes zero; ties break by doc_id") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q_id", "doc_id", "rk")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 14L, 3))
      .toDF("q_id", "doc_id", "rk")
    val fused = Retrieval.rrfFuse(a, b, k = 10)
      .orderBy("rk").as[(Long, Long, Int)].collect().toSeq
    // doc 11: 1/62 + 1/61 dominates every single-list doc
    assert(fused.head == ((1L, 11L, 1)), fused.toString)
    // doc 10 (rank 1 in a alone, 1/61) beats doc 13 (rank 2 in b, 1/62)
    val pos = fused.map(r => r._2 -> r._3).toMap
    assert(pos(10L) < pos(13L))
    // exact tie: doc 12 (1/63 from a) vs doc 14 (1/63 from b) — the
    // smaller doc_id must come first in BOTH engines' ordering
    assert(pos(12L) < pos(14L))
    assert(fused.size == 5)
    intercept[IllegalArgumentException](Retrieval.rrfFuse(a, b, kRrf = 0))
  }

  // hand-computable MaxSim fixture: one query of two token vectors
  // against two docs; every dot is trivial integer arithmetic
  private def qToks = Seq(
    (1L, 100L, Seq(1, 0)), (1L, 101L, Seq(0, 1)))
    .toDF("q_id", "qtok_id", "qvec")
  private def dToks = Seq(
    (10L, Seq(2, 0)), (10L, Seq(0, 3)), (20L, Seq(1, 1)))
    .toDF("d_id", "dvec")

  test("maxSimTopK: sum of per-query-token maxes, rank by score") {
    // score(1,10) = max(2,0) + max(0,3) = 5; score(1,20) = 1 + 1 = 2
    val got = Retrieval.maxSimTopK(qToks, dToks, k = 10)
      .orderBy("rk").as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 10L, 5L, 1), (1L, 20L, 2L, 2)), got.toString)
  }

  test("maxSimTopK: candidates restrict scoring to the given pairs " +
      "and agree with the full product on them") {
    val cand = Seq((1L, 20L)).toDF("q_id", "d_id")
    val got = Retrieval.maxSimTopK(qToks, dToks, k = 10,
      candidates = Some(cand))
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 20L, 2L, 1)), got.toString)
  }

  test("maxSimTopK: excludeSelf drops the query's own document") {
    val d = dToks.union(Seq((1L, Seq(9, 9))).toDF("d_id", "dvec"))
    val ids = Retrieval.maxSimTopK(qToks, d, k = 10, excludeSelf = true)
      .select("d_id").as[Long].collect().toSet
    assert(ids == Set(10L, 20L), ids.toString)
    // and without the flag the self doc dominates (score 9+9)
    val top = Retrieval.maxSimTopK(qToks, d, k = 1)
      .as[(Long, Long, Long, Int)].head()
    assert(top == ((1L, 1L, 18L, 1)), top.toString)
  }

  test("maxSimTopK matches a brute Scala reference on fuzzed vectors") {
    // deterministic LCG vectors: 6 queries × 3 tokens, 40 docs × 4
    // tokens, dim 8, values in [-9, 9]
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L))
    def vec(seed: Long): Seq[Int] =
      lcg(seed).drop(1).take(8).map(v => ((v >>> 33) % 19 - 9).toInt).toSeq
    val qRows = for (q <- 0 until 6; t <- 0 until 3)
      yield (q.toLong, (q * 3 + t).toLong, vec(q * 1000 + t))
    val dRows = for (d <- 0 until 40; t <- 0 until 4)
      yield (d.toLong, vec(900000 + d * 100 + t))
    val got = Retrieval.maxSimTopK(
      qRows.toDF("q_id", "qtok_id", "qvec"),
      dRows.toDF("d_id", "dvec"), k = 7)
      .as[(Long, Long, Long, Int)].collect().toSet
    // reference: plain Scala loops
    val expect = (for (q <- 0 until 6) yield {
      val qtoks = qRows.filter(_._1 == q).map(_._3)
      val scored = (0 until 40).map { d =>
        val dtoks = dRows.filter(_._1 == d.toLong).map(_._2)
        val s = qtoks.map(qv => dtoks.map(dv =>
          qv.zip(dv).map { case (a, b) => a.toLong * b }.sum).max).sum
        (d.toLong, s)
      }
      scored.sortBy { case (d, s) => (-s, d) }.take(7).zipWithIndex
        .map { case ((d, s), i) => (q.toLong, d, s, i + 1) }
    }).flatten.toSet
    assert(got == expect)
  }

  test("sumPool: positional integer sums reassembled in order") {
    val toks = Seq((1L, Seq(1, 2, 3)), (1L, Seq(10, 20, 30)),
      (2L, Seq(5, -5, 0))).toDF("d_id", "dvec")
    val got = Retrieval.sumPool(toks, "d_id", "dvec")
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == Map(1L -> Seq(11, 22, 33), 2L -> Seq(5, -5, 0)), got)
    // the pooled-dot identity: dot(sum(q), sum(d)) == sum of all
    // pairwise dots — the reason pooling is a MaxSim-correlated proxy
    val q = Seq(Seq(1, 0, 2), Seq(0, 3, 1))
    val d = Seq(Seq(2, 1, 0), Seq(1, 1, 1))
    def dot(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val pooled = dot(q.transpose.map(_.sum), d.transpose.map(_.sum))
    val allPairs = (for (a <- q; b <- d) yield dot(a, b)).sum
    assert(pooled == allPairs)
  }

  test("booleanAndQrels: relevant iff EVERY query term present; " +
      "duplicate query terms don't inflate the arity gate") {
    val q = Seq((1L, "apple"), (1L, "cherry"), (1L, "cherry"),
      (2L, "durian")).toDF("q_id", "term")
    val got = Retrieval.booleanAndQrels(docs, q)
      .as[(Long, Long)].collect().toSet
    // apple AND cherry: docs 1, 2, 4 (doc 3 lacks apple);
    // durian: doc 4 only
    assert(got == Set((1L, 1L), (1L, 2L), (1L, 4L), (2L, 4L)), got)
  }

  test("rankEval: hit counts, first-relevant rank, 0 sentinel on " +
      "miss, and empty-qrel queries dropped") {
    val run = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1), (9L, 10L, 1)).toDF("q_id", "doc_id", "rk")
    val qrels = Seq((1L, 20L), (1L, 30L), (1L, 99L), (2L, 55L))
      .toDF("q_id", "doc_id")
    val got = Retrieval.rankEval(run, qrels, k = 2)
      .as[(Long, Long, Long, Int)].collect().toSet
    // q1: 3 rel, top-2 contains doc 20 (rk 2) -> hits 1, first rank 2
    // q2: 1 rel, none retrieved -> (1, 0, 0)
    // q9: no qrels -> dropped
    assert(got == Set((1L, 3L, 1L, 2), (2L, 1L, 0L, 0)), got)
    // widen k: doc 30 at rk 3 now counts and first rank stays 2
    val got3 = Retrieval.rankEval(run, qrels, k = 3)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got3 == Set((1L, 3L, 2L, 2), (2L, 1L, 0L, 0)), got3)
    intercept[IllegalArgumentException](Retrieval.rankEval(run, qrels, 0))
  }

  test("gradedQrels: grade is the capped integer log2 of matched-term " +
      "frequency") {
    val d = Seq(
      (1L, "apple"), // tf 1 -> len(bin(1)) = 1
      (2L, "apple apple apple"), // tf 3 -> 2
      (3L, "apple " * 20), // tf 20 -> len(bin(20)) = 5 -> capped 4
      (4L, "pear")) // no match -> absent
      .toDF("doc_id", "text")
    val q = Seq((1L, "apple")).toDF("q_id", "term")
    val got = Retrieval.gradedQrels(d, q)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 4L), got.toString)
  }

  test("gradedRankEval: perfect ranking scores exactly 1e6 ppm, " +
      "inverted ranking the hand-computed floor ratio") {
    val qrels = Seq((1L, 10L, 3L), (1L, 20L, 2L), (1L, 30L, 1L))
      .toDF("q_id", "doc_id", "grade")
    def run(order: Seq[Long]) = order.zipWithIndex
      .map { case (d, i) => (1L, d, i + 1) }.toDF("q_id", "doc_id", "rk")
    // ideal: 3·13860 + 2·9240 + 1·6930 = 66990
    val perfect = Retrieval.gradedRankEval(
      run(Seq(10L, 20L, 30L)), qrels)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(perfect == ((1L, 3L, 66990L, 66990L, 1000000L)),
      perfect.toString)
    // inverted: 1·13860 + 2·9240 + 3·6930 = 53130; ppm = ⌊53130e6/66990⌋
    val inv = Retrieval.gradedRankEval(run(Seq(30L, 20L, 10L)), qrels)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(inv == ((1L, 3L, 53130L, 66990L, 793103L)), inv.toString)
  }

  test("gradedRankEval: ideal positions cap at k and a run that " +
      "misses everything scores 0") {
    // 12 grade-2 docs but only 10 ideal slots: idcg = 2·prefix(10)
    val qrels = (1L to 12L).map(d => (7L, d, 2L))
      .toDF("q_id", "doc_id", "grade")
    val emptyRun = Seq((7L, 999L, 1)).toDF("q_id", "doc_id", "rk")
    val got = Retrieval.gradedRankEval(emptyRun, qrels)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((7L, 12L, 0L, 111982L, 0L)), got.toString)
    intercept[IllegalArgumentException](
      Retrieval.gradedRankEval(emptyRun, qrels, k = 0))
  }
}
