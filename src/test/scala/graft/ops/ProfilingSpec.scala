package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed pins for the profiling/mixture/transition operators. */
class ProfilingSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("covMatrix: exact n·Σxy − Σx·Σy on a hand-computed frame") {
    // x = [1.0, 2.0, 3.0], y = [2.0, 4.0, 8.0], scale 10^1
    // fx = [10,20,30], fy = [20,40,80]
    // n=3, Σx=60, Σy=140, Σxx=1400, Σxy=3400, Σyy=8400
    // cov(x,x)=3·1400−60·60=600; cov(x,y)=3·3400−60·140=1800
    // cov(y,y)=3·8400−140·140=5600
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 8.0)).toDF("x", "y")
    val got = Profiling.covMatrix(df, Seq("x", "y"), scaleDigits = 1)
      .orderBy("x_col", "y_col")
      .select(col("x_col"), col("y_col"), col("n"),
        col("cov_num").cast("long"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("x", "x", 3L, 600L),
      ("x", "y", 3L, 1800L),
      ("y", "y", 3L, 5600L)), got.toString)
  }

  test("covMatrix: anti-correlated pair goes negative, constant is zero") {
    val df = Seq((1.0, 3.0, 7.0), (2.0, 2.0, 7.0), (3.0, 1.0, 7.0))
      .toDF("a", "b", "c")
    val got = Profiling.covMatrix(df, Seq("a", "b", "c"), scaleDigits = 0)
      .orderBy("x_col", "y_col")
      .select(col("x_col"), col("y_col"), col("cov_num").cast("long"))
      .as[(String, String, Long)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(got(("a", "b")) == -6L, got.toString) // 3·10 − 6·6
    assert(got(("a", "c")) == 0L)
    assert(got(("c", "c")) == 0L)
  }

  test("paretoFrontier: strict dominance, equal-x and equal-pair ties") {
    // (price, size): frontier = (1,5), (3,9); (1,4) dominated by (1,5)
    // at equal x; (2,5) dominated by (1,5) at equal y; duplicates of a
    // frontier point ALL survive (neither strictly dominates the other)
    val df = Seq(
      (10L, 1.0, 5), (11L, 1.0, 4), (12L, 2.0, 5), (13L, 3.0, 9),
      (14L, 3.0, 9), (15L, 4.0, 8)).toDF("id", "x", "y")
    val got = Profiling.paretoFrontier(df, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(10L, 13L, 14L), got.toString)
  }

  test("paretoFrontier: dominance propagates ACROSS value-range buckets") {
    // nBuckets = 3 over x in [1, 9] → buckets ~[1,3.67) [3.67,6.33)
    // [6.33,9]. y strictly decreasing ⇒ only the global-min x
    // survives; every later bucket's rows must die to __prev_bkt (their
    // in-bucket prev is null or smaller). y strictly increasing ⇒ all
    // survive (both prev maxima always smaller).
    val dec = (1 to 9).map(i => (i.toLong, i.toDouble, 100 - i))
      .toDF("id", "x", "y")
    val gotDec = Profiling.paretoFrontier(dec, "x", "y", nBuckets = 3)
      .select("id").as[Long].collect().toSet
    assert(gotDec == Set(1L), gotDec.toString)
    val inc = (1 to 9).map(i => (i.toLong, i.toDouble, i))
      .toDF("id", "x", "y")
    val gotInc = Profiling.paretoFrontier(inc, "x", "y", nBuckets = 3)
      .select("id").as[Long].collect().toSet
    assert(gotInc == (1L to 9L).toSet, gotInc.toString)
    // equal-x ties at a bucket edge: max-y wins within x, both dupes kept
    val ties = Seq((1L, 1.0, 5), (2L, 9.0, 9), (3L, 9.0, 9))
      .toDF("id", "x", "y")
    val gotTies = Profiling.paretoFrontier(ties, "x", "y", nBuckets = 3)
      .select("id").as[Long].collect().toSet
    assert(gotTies == Set(1L, 2L, 3L), gotTies.toString)
  }

  test("paretoFrontier plan: the only global ordered window runs on the " +
      "bucket-maxima frame, never the corpus-sized distinct-x frame") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, i % 7))
      .toDF("id", "x", "y")
    val plan = Profiling.paretoFrontier(df, "x", "y")
      .queryExecution.sparkPlan
    val wins = plan.collect { case w: WindowExec => w }
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.size == 1,
      s"expected exactly one unpartitioned window, got ${global.size}")
    // its input subtree must aggregate by __bkt first — only the
    // nBuckets-row maxima frame may pay a single-task sort
    val bucketAggBelow = global.head.collect {
      case a: HashAggregateExec
          if a.groupingExpressions.exists(_.name == "__bkt") => a
    }
    assert(bucketAggBelow.nonEmpty,
      "global window must consume the per-bucket maxima aggregate")
  }

  test("waterfill: small groups capped, remainder dealt one token each") {
    // caps [2, 10, 10, 30] asc, total 52, budget 26
    // i=1: 2·4 = 8 <= 26 → capped. left 24 over 3 → fair 8 each
    // i=2: 10·3 = 30 > 24 → uncapped (and so all after: prefix proof)
    // base = 24 div 3 = 8, rem 0 → allocs [2, 8, 8, 8], Σ = 26
    val caps = Seq(("a", 30L), ("b", 10L), ("c", 2L), ("d", 10L))
      .toDF("k", "cap")
    val byK = Mixture.waterfill(caps, "k", "cap")
      .select(col("k"), col("alloc_tokens"), col("capped"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(byK == Map("c" -> ((2L, true)), "b" -> ((8L, false)),
      "d" -> ((8L, false)), "a" -> ((8L, false))), byK.toString)
  }

  test("waterfill: sub-token remainder lands on the FIRST uncapped rows") {
    // caps [3, 7, 9] asc, total 19, budget 9 (numer 1, denom 2 → 9)
    // i=1: 3·3 = 9 <= 9 → capped. left 6 over 2 → base 3, rem 0
    // → [3, 3, 3]. With budget 10/19·19? use numer 10, denom 19 → 10:
    // i=1: 3·3 = 9 <= 10 → capped; left 7 over 2 → base 3, rem 1 →
    // first uncapped (cap asc, key asc = "b") takes the extra token
    val caps = Seq(("a", 9L), ("b", 7L), ("c", 3L)).toDF("k", "cap")
    val got = Mixture.waterfill(caps, "k", "cap",
      budgetNumer = 10L, budgetDenom = 19L)
      .select(col("k"), col("alloc_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("c" -> 3L, "b" -> 4L, "a" -> 3L), got.toString)
    assert(got.values.sum == 10L)
  }

  test("waterfill matches the sequential reference model on random caps") {
    // fixed-seed random instances: the Spark prefix-count plan must
    // agree with the independent sequential model exactly
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val caps = (0 until (1 + rnd.nextInt(12)))
        .map(i => (s"g$i", rnd.nextInt(500).toLong))
      val (nu, de) = (1L + rnd.nextInt(3), 2L + rnd.nextInt(3))
      val want = WaterfillModel.allocate(caps, nu, de)
      val got = Mixture.waterfill(caps.toDF("k", "cap"), "k", "cap",
          budgetNumer = nu, budgetDenom = de)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3))))
        .toMap
      assert(got == want, s"trial $trial caps=$caps nu=$nu de=$de")
    }
  }

  test("waterfill: budget above total capacity caps everyone") {
    val caps = Seq(("a", 5L), ("b", 3L)).toDF("k", "cap")
    val got = Mixture.waterfill(caps, "k", "cap",
      budgetNumer = 2L, budgetDenom = 1L)
      .select(col("k"), col("alloc_tokens"), col("capped"))
      .collect().map(r =>
        (r.getString(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map("a" -> ((5L, true)), "b" -> ((3L, true))),
      got.toString)
  }

  test("olsTrend: exact slope ratio; constant-x groups flag degenerate") {
    // g: (1,2),(2,4),(3,6) → num = 3·28−6·12 = 12, den = 3·14−36 = 6,
    // slope 2.0; h: x constant → den 0 → degenerate, slope 0
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
      ("h", 5.0, 1.0), ("h", 5.0, 9.0)).toDF("grp", "x", "y")
    val got = Profiling.olsTrend(df, "grp", "x", "y", scaleDigits = 0)
      .select(col("grp"), col("n"), col("slope_num").cast("long"),
        col("slope_den").cast("long"), col("degenerate"), col("slope"))
      .as[(String, Long, Long, Long, Boolean, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("g") == (("g", 3L, 12L, 6L, false, 2.0)), got.toString)
    assert(got("h") == (("h", 2L, 0L, 0L, true, 0.0)), got.toString)
  }

  test("funnelSteps: strict ordering, per-step window, earliest anchor") {
    // w = 5: u1 completes; u2's click precedes its view; u4's click is
    // outside the window; u5's click ties the view ts (strict >); u6
    // anchors at its EARLIEST click (11), so purchase@17 > 11+5 drops
    val ev = Seq(
      (1L, 10L, "view"), (1L, 12L, "click"), (1L, 14L, "purchase"),
      (2L, 10L, "view"), (2L, 5L, "click"),
      (3L, 10L, "click"),
      (4L, 10L, "view"), (4L, 16L, "click"),
      (5L, 10L, "view"), (5L, 10L, "click"),
      (6L, 10L, "view"), (6L, 11L, "click"), (6L, 12L, "click"),
      (6L, 17L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventOps.funnelSteps(ev,
        Seq("view", "click", "purchase"), windowUs = 5L)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "view", 5L), (2L, "click", 2L),
      (3L, "purchase", 1L)), got.toString)
  }

  test("topPaths: ordered sliding triples, short users drop, tie order") {
    // u1 A B C D → (A,B,C),(B,C,D); u2 A B C → (A,B,C); u3 A B → none
    // equal-ts order breaks by event_id (u2's B/C share ts)
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "C"),
      (1L, 4L, 40L, "D"),
      (2L, 5L, 10L, "A"), (2L, 6L, 20L, "B"), (2L, 7L, 20L, "C"),
      (3L, 8L, 10L, "A"), (3L, 9L, 20L, "B"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
    val got = EventOps.topPaths(ev, k = 10, minCount = 1)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("A", "B", "C", 2L), ("B", "C", "D", 1L)),
      got.toString)
    assert(EventOps.topPaths(ev, k = 10, minCount = 2).count() == 1L)
  }

  test("markovTransitions: counts and conditional probabilities") {
    // user 1: A B A B   → A→B ×2, B→A ×1
    // user 2: A A B     → A→A ×1, A→B ×1
    // rows: (A,A,1,4,0.25) (A,B,3,4,0.75) (B,A,1,1,1.0)
    val ev = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "B"),
      (3L, 1L, 30L, "A"), (4L, 1L, 40L, "B"),
      (5L, 2L, 10L, "A"), (6L, 2L, 20L, "A"), (7L, 2L, 30L, "B"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.markovTransitions(ev)
      .orderBy("from_type", "to_type")
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("row_total"), col("p_trans"))
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("A", "A", 1L, 4L, 0.25), ("A", "B", 3L, 4L, 0.75),
      ("B", "A", 1L, 1L, 1.0)), got.toString)
  }

  test("markovTransitions: equal-ts order breaks by event_id") {
    val ev = Seq(
      (2L, 1L, 10L, "B"), (1L, 1L, 10L, "A"), (3L, 1L, 20L, "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.markovTransitions(ev)
      .select("from_type", "to_type")
      .as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("B", "C")), got.toString)
  }

  test("joinBlowupAudit: per-key products, totals and top share, " +
      "hand-computed") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L).map(Tuple1(_)).toDF("jk")
    val right = Seq(1L, 1L, 2L, 4L).map(Tuple1(_)).toDF("jk")
    // matched keys: 1 -> 3*2 = 6, 2 -> 2*1 = 2 (3 and 4 unmatched);
    // total 8, top share 6*100 div 8 = 75
    val got = Profiling.joinBlowupAudit(left, right, "jk", topK = 10)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 6L, 8L, 2L, 75L),
      (2L, 2L, 1L, 2L, 8L, 2L, 75L)), got.toString)
  }

  test("joinBlowupAudit: topK cut is deterministic under ties and " +
      "nulls never count") {
    val left = Seq(Some(5L), Some(6L), Some(7L), None)
      .map(Tuple1(_)).toDF("jk")
    val right = Seq(Some(5L), Some(6L), Some(7L), None)
      .map(Tuple1(_)).toDF("jk")
    // all three matched keys tie at out_rows = 1 -> smallest keys win
    val got = Profiling.joinBlowupAudit(left, right, "jk", topK = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(5L, 6L), got.toString)
    assert(got.forall(g => g._5 == 3L && g._6 == 3L), got.toString)
    intercept[IllegalArgumentException](
      Profiling.joinBlowupAudit(left, right, "jk", topK = 0))
  }

  test("corpusInequality: hand-computed Gini and HHI on a two-doc " +
      "corpus") {
    // lengths 1 and 3: SumAbs/2 = 1·(3·1 − 1) = 2; Gini = 2/(2·4) =
    // 0.25; two even languages: HHI = 2/4 = 0.5
    val docs = Seq((1L, "a", "en"), (2L, "a b c", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Profiling.corpusInequality(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((2L, 4L, 2L, 250000L, 2L, 500000L)), got.toString)
  }

  test("corpusInequality: equal lengths give Gini 0, a single " +
      "language gives HHI 1e6, empty docs drop") {
    val docs = Seq((1L, "a b", "en"), (2L, "c d", "en"),
      (3L, "e f", "en"), (4L, "   ", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = Profiling.corpusInequality(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 6L, 1L, 0L, 1L, 1000000L)), got.toString)
  }

  test("corpusInequality: skewed corpus approaches the closed-form " +
      "(n-1)/n bound") {
    // 9 docs of 1 token + 1 doc of 991 tokens: T = 1000.
    // SumAbs/2 = 9·(991·9... wait — compute: v=1,n=9 contributes 0;
    // v=991,n=1: cum_n=9, cum_t=9 -> s = 991·9 − 9 = 8910.
    // Gini = 8910/(10·1000) = 0.891 -> 891000 ppm.
    val one = (1L to 9L).map(i => (i, "t", "en"))
    val big = Seq((10L, Seq.fill(991)("t").mkString(" "), "en"))
    val docs = (one ++ big).toDF("doc_id", "text", "lang")
    val got = Profiling.corpusInequality(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got._4 == 891000L, got.toString)
  }

test("spearmanMoments: hand-computed doubled tie ranks and exact " +
      "moment strings") {
    // (x, y): (1,10),(2,20),(2,30),(3,30)
    // doubled x-ranks: 1->2, 2->5, 3->8; y-ranks: 10->2, 20->4, 30->7
    // pairs (2,2),(5,4),(5,7),(8,7): n=4, Sx=Sy=20, Sxy=115,
    // Sx2=Sy2=118 -> num = 4*115-400 = 60, den = 4*118-400 = 72
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 30L))
      .toDF("x", "y")
    val got = Profiling.spearmanMoments(df, col("x"), col("y"))
      .as[(Long, String, String, String)].collect().head
    assert(got == ((4L, "60", "72", "72")), got.toString)
  }

  test("spearmanMoments: a perfect monotone pairing makes num equal " +
      "both denominators (rho = 1); reversal flips the sign") {
    val up = Seq((1L, 5L), (2L, 9L), (3L, 11L)).toDF("x", "y")
    val u = Profiling.spearmanMoments(up, col("x"), col("y"))
      .as[(Long, String, String, String)].collect().head
    assert(u._2 == u._3 && u._3 == u._4, u.toString)
    val down = Seq((1L, 11L), (2L, 9L), (3L, 5L)).toDF("x", "y")
    val d = Profiling.spearmanMoments(down, col("x"), col("y"))
      .as[(Long, String, String, String)].collect().head
    assert(d._2 == "-" + d._3 && d._3 == d._4, d.toString)
  }

  test("spearmanMoments: an all-tied column yields a zero " +
      "denominator, never a crash") {
    val df = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val got = Profiling.spearmanMoments(df, col("x"), col("y"))
      .as[(Long, String, String, String)].collect().head
    assert(got._2 == "0" && got._3 == "0" && got._4 != "0", got.toString)
  }
}
