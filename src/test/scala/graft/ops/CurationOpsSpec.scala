package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling, Redaction, and Components — the corpus-curation trio. */
class CurationOpsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  // ------------------------------------------------------------ Sampling

  test("epochUpsample: integer budgets give exact copy counts; " +
      "fractional coin is deterministic and monotone") {
    val df = (0 until 800).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "de", s"document body $i")
    }.toDF("doc_id", "lang", "text")
    def run(budgets: Seq[(String, Double)]) =
      Sampling.epochUpsample(df, col("lang"), col("text"), budgets)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
    // pure integer budgets: exactly 3 copies of en, 1 of de
    val exact = run(Seq("en" -> 3.0, "de" -> 1.0))
    assert(exact == Map("en" -> 1200L, "de" -> 400L))
    // fractional: en 2.5 -> 1000 +- binomial noise (sd ~ 10)
    val frac = run(Seq("en" -> 2.5, "de" -> 0.5))
    assert(math.abs(frac("en") - 1000L) < 60, frac.toString)
    assert(math.abs(frac("de") - 200L) < 60, frac.toString)
    assert(frac == run(Seq("en" -> 2.5, "de" -> 0.5)), "must be stable")
    // monotone coin: every doc with the extra copy at 0.25 also has it
    // at 0.75 (same md5 bucket, higher threshold)
    def extras(e: Double): Set[Long] =
      Sampling.epochUpsample(df.filter(col("lang") === "en"),
        col("lang"), col("text"), Seq("en" -> (1.0 + e)))
        .filter(col("copy_idx") === 2L)
        .select("doc_id").as[Long].collect().toSet
    assert(extras(0.25).subsetOf(extras(0.75)))
    // downsampled stratum only ever emits copy_idx 1
    val down = Sampling.epochUpsample(df, col("lang"), col("text"),
      Seq("de" -> 0.5), defaultEpochs = 1.0)
    assert(down.filter(col("lang") === "de" && col("copy_idx") =!= 1L)
      .count() == 0L)
    intercept[IllegalArgumentException](
      Sampling.epochUpsample(df, col("lang"), col("text"),
        Seq("en" -> -1.0)))
  }



  test("thresholdHex maps rates to fixed-width bounds") {
    assert(Sampling.thresholdHex(0.0) == "0000")
    assert(Sampling.thresholdHex(0.5) == "8000")
    assert(Sampling.thresholdHex(0.125) == "2000")
    assert(Sampling.thresholdHex(1.0) == "g000") // above every hex bucket
    intercept[IllegalArgumentException](Sampling.thresholdHex(1.5))
  }

  test("deterministic sample is stable and rate-accurate") {
    val df = (0 until 2000).map(i => (i.toLong, s"document number $i"))
      .toDF("id", "text")
    val once = Sampling.deterministicSample(df, col("text"), 0.25)
      .select("id").as[Long].collect().toSet
    val again = Sampling.deterministicSample(df, col("text"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(once == again, "same input must give the same sample")
    // binomial(2000, 0.25): sd ≈ 19; allow 5 sd
    assert(math.abs(once.size - 500) < 100, s"got ${once.size}")
    // rate monotonicity: a higher-rate sample is a superset
    val wider = Sampling.deterministicSample(df, col("text"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(once.subsetOf(wider))
    assert(Sampling.deterministicSample(df, col("text"), 1.0).count() == 2000)
    assert(Sampling.deterministicSample(df, col("text"), 0.0).count() == 0)
  }

  test("capPerKey keeps at most k rows per key, partitioning-invariant") {
    val df = (0 until 900).map { i =>
      (i.toLong, if (i % 9 == 0) "rare" else "hot")
    }.toDF("id", "domain")
    val capped = Sampling.capPerKey(df, col("domain"), col("id"), k = 50)
    val byKey = capped.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byKey("hot") == 50L && byKey("rare") == 50L, byKey.toString)
    // survivor SET is a function of content only, not of partitioning
    val ids1 = capped.select("id").as[Long].collect().toSet
    val ids2 = Sampling.capPerKey(df.repartition(7), col("domain"),
      col("id"), k = 50).select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // the rank-limit pushdown must be in the physical plan
    assert(capped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("systematicByWeight: ~k per group, weight-proportional, deterministic") {
    // group A: uniform weights; group B: one heavy row among light ones
    val rows = (0 until 400).map(i => (i.toLong, "A", 10L)) ++
      (1000 until 1100).map(i =>
        (i.toLong, "B", if (i == 1050) 5000L else 5L))
    val df = rows.toDF("id", "grp", "w")
    val picked = Sampling.systematicByWeight(
      df, col("grp"), col("w"), col("id"), k = 20)
    val byGrp = picked.groupBy("grp").count()
      .as[(String, Long)].collect().toMap
    // systematic design: within ±1 of k per group
    assert(byGrp.values.forall(c => c >= 19 && c <= 21), byGrp.toString)
    // the heavy row (90% of B's weight) must be selected
    assert(picked.filter(col("id") === 1050L).count() == 1)
    // zero/negative weights are never selected
    val withZeros = df.union(Seq((5000L, "A", 0L)).toDF("id", "grp", "w"))
    assert(Sampling.systematicByWeight(withZeros, col("grp"), col("w"),
      col("id"), k = 20).filter(col("id") === 5000L).count() == 0)
    // partitioning-invariant (deterministic selection set)
    val ids1 = picked.select("id").as[Long].collect().toSet
    val ids2 = Sampling.systematicByWeight(df.repartition(7), col("grp"),
      col("w"), col("id"), k = 20).select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("systematicByWeight matches the reference model on fuzzed groups") {
    // SamplingProps pins the MODEL's contract generatively; this pins
    // Spark == model on skew-heavy pseudo-random inputs (fixed seed).
    val rnd = new scala.util.Random(20260812L)
    val rows = for {
      g <- 0 until 6
      n = 30 + rnd.nextInt(80)
      i <- 0 until n
    } yield (g * 10000L + i, s"g$g",
      if (rnd.nextInt(10) == 0) 1L + rnd.nextInt(1000000)
      else 1L + rnd.nextInt(500))
    val df = rows.toDF("id", "grp", "w")
    val k = 15
    val got = Sampling.systematicByWeight(
      df, col("grp"), col("w"), col("id"), k)
      .select("id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).values.flatMap { grp =>
      SystematicModel.select(grp.map(r => (r._1, r._3)).toSeq, k)
    }.toSet
    assert(got == want)
    assert(got.size == 6 * k)
  }

  test("stratified sample applies per-stratum rates") {
    val df = (0 until 3000).map { i =>
      (i.toLong, s"text body $i", if (i % 3 == 0) "en" else "zh")
    }.toDF("id", "text", "lang")
    val sampled = Sampling.stratifiedSample(df, col("lang"), col("text"),
      Seq("en" -> 1.0, "zh" -> 0.0), defaultRate = 0.5)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang.getOrElse("en", 0L) == 1000L, "en kept fully")
    assert(byLang.getOrElse("zh", 0L) == 0L, "zh dropped fully")
  }

  test("capStratumShare: small strata survive whole, big strata thin to ~cap") {
    val df = ((0 until 4000).map(i => (i.toLong, s"doc body $i", "en")) ++
      (4000 until 4050).map(i => (i.toLong, s"doc body $i", "rare")))
      .toDF("doc_id", "text", "lang")
    val kept = Sampling.capStratumShare(df, col("lang"), col("text"), cap = 200L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // n <= cap keeps EVERY row — provable: bucket16 < 65536 <= cap/n*65536
    assert(kept("rare") == 50L, s"rare stratum must survive whole: $kept")
    // the dominant stratum thins to cap in expectation (binomial sd
    // ~ sqrt(200) => a generous but non-vacuous band)
    assert(kept("en") > 130L && kept("en") < 270L,
      s"en stratum should be ~200: $kept")
    // determinism: a second evaluation yields the identical set
    val again = Sampling.capStratumShare(df, col("lang"), col("text"), cap = 200L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(again == kept)
  }

  test("sqrtShareSample: small strata whole, big strata grow as sqrt(n)") {
    val df = ((0 until 6400).map(i => (i.toLong, s"doc body $i", "en")) ++
      (6400 until 6500).map(i => (i.toLong, s"doc body $i", "rare")) ++
      (6500 until 6900).map(i => (i.toLong, s"doc body $i", "mid")))
      .toDF("doc_id", "text", "lang")
    val kept = Sampling.sqrtShareSample(df, col("lang"), col("text"), k = 8L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // n <= k^2 = 64... rare has n=100 > 64, expect ~8*sqrt(100)=80
    assert(kept("rare") > 60L && kept("rare") < 100L, s"rare ~80: $kept")
    // en: 8*sqrt(6400) = 640 expected (binomial sd ~25)
    assert(kept("en") > 540L && kept("en") < 740L, s"en ~640: $kept")
    // mid: 8*sqrt(400) = 160 expected
    assert(kept("mid") > 110L && kept("mid") < 210L, s"mid ~160: $kept")
    // the FLATTENING property: en is 64x rare by rows but only ~8x
    // after sampling
    assert(kept("en") < kept("rare") * 12,
      s"sqrt flattening failed: $kept")
  }

  // ----------------------------------------------------------- Redaction

  test("hashSplit: exhaustive, disjoint, and consistent with the sampler") {
    val df = (0 until 1000).map(i => (i.toLong, s"document body $i"))
      .toDF("doc_id", "text")
    val split = Sampling.hashSplit(df, col("text"), 0.1)
    val byLabel = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.values.sum == 1000, "every row must be labeled")
    // binomial(1000, 0.1): sd ≈ 9.5; allow ~5 sd
    assert(math.abs(byLabel("eval") - 100) < 50, s"got $byLabel")
    // the eval side IS the deterministic sample at the same rate —
    // one hash family, so sample and split can never disagree
    val evalIds = split.filter(col("split") === "eval")
      .select("doc_id").as[Long].collect().toSet
    val sampled = Sampling.deterministicSample(df, col("text"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(evalIds == sampled)
  }

  test("leakageSafeSplit: clusters never straddle; singletons match " +
    "hashSplit; audit reports zero leaks for the safe labeling") {
    val df = (0 until 200).map(i => (i.toLong, s"document body $i"))
      .toDF("doc_id", "text")
    // a 3-chain {0,1,2}, a pair {10,11}, everything else singleton
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L))
      .toDF("src", "dst")
    val comps = Components.connectedComponents(
      edges, df.select(col("doc_id").as("node")))
    val safe = Sampling.leakageSafeSplit(df, comps, col("text"), 0.3)
    assert(safe.count() == 200, "every row labeled")
    // every component maps to exactly one split label
    val straddlers = safe.groupBy("component")
      .agg(count_distinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddlers == 0, "a cluster straddled the split")
    // cluster members wear the REPRESENTATIVE's label: doc 2 splits by
    // doc 0's text, not its own
    val naive = Sampling.hashSplit(df, col("text"), 0.3)
      .select(col("doc_id"), col("split").as("naive_split"))
    val rep0 = naive.filter(col("doc_id") === 0L)
      .select("naive_split").as[String].head()
    val got2 = safe.filter(col("doc_id") === 2L)
      .select("split").as[String].head()
    assert(got2 == rep0, "member must wear the rep's label")
    // singletons are their own representative ⇒ identical to hashSplit
    val joined = safe.join(naive, "doc_id")
      .filter(!col("doc_id").isin(0L, 1L, 2L, 10L, 11L))
    assert(joined.filter(col("split") =!= col("naive_split")).count() == 0)
    // the audit: safe labeling has zero leaking pairs by construction
    val audit = Sampling.splitLeakageAudit(
      edges, safe.select("doc_id", "split"))
      .as[(Long, Long)].head()
    assert(audit == ((3L, 0L)), s"audit: $audit")
  }

  test("prefixSums: two-level decomposition equals the global window " +
      "across bucket boundaries, sparse ids, and bucket sizes") {
    val df = Seq((0L, 5L), (1L, 3L), (7L, 10L), (8L, 1L), (20L, 4L),
      (21L, 2L), (35L, 7L)).toDF("doc_id", "len")
    // reference: plain scala running sum in doc_id order
    val rows = Seq((0L, 5L), (1L, 3L), (7L, 10L), (8L, 1L), (20L, 4L),
      (21L, 2L), (35L, 7L))
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .sliding(2).map { case Seq((_, acc), (id, _)) => id -> acc }.toMap
    for (bs <- Seq(1, 4, 8, 1000)) {
      val got = Sampling.prefixSums(df, col("doc_id"), col("len"), bs)
        .select("doc_id", "prefix").as[(Long, Long)].collect().toMap
      assert(got == expect, s"bucketSize=$bs: $got")
    }
    intercept[IllegalArgumentException](
      Sampling.prefixSums(df, col("doc_id"), col("len"), 0))
    // the recursive levels (ADVICE r15: implemented, not a doc
    // promise): every depth replays the same exclusive prefix sums —
    // levels 3 with a tiny bucketSize forces genuine recursion (ids to
    // 35 → two bucket levels at bs=4), levels 1 is the terminal plain
    // window
    for (lv <- Seq(1, 2, 3, 4); bs <- Seq(2, 4)) {
      val got = Sampling.prefixSums(df, col("doc_id"), col("len"), bs,
        levels = lv)
        .select("doc_id", "prefix").as[(Long, Long)].collect().toMap
      assert(got == expect, s"levels=$lv bucketSize=$bs: $got")
    }
    intercept[IllegalArgumentException](
      Sampling.prefixSums(df, col("doc_id"), col("len"), 4, levels = 0))
    // partitioned variant: running sums reset per group, decomposition
    // still bucket-invariant
    val g = Seq(("a", 0L, 5L), ("a", 3L, 2L), ("a", 9L, 1L),
      ("b", 1L, 7L), ("b", 8L, 4L)).toDF("src", "doc_id", "len")
    val expectG = Map(("a", 0L) -> 0L, ("a", 3L) -> 5L,
      ("a", 9L) -> 7L, ("b", 1L) -> 0L, ("b", 8L) -> 7L)
    for (bs <- Seq(1, 4, 1000); lv <- Seq(2, 3)) {
      val got = Sampling.prefixSums(g, col("doc_id"), col("len"), bs,
        part = Seq("src"), levels = lv)
        .select("src", "doc_id", "prefix")
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got == expectG, s"part bucketSize=$bs levels=$lv: $got")
    }
  }

  test("packingFragmentation: boundary-crossing docs counted exactly") {
    // block 10: spans [0,4) [4,12)* [12,14) [14,24)* [24,30) —
    // *crosses a multiple of 10; total 30 -> 3 blocks
    val df = Seq((0L, 4L), (1L, 8L), (2L, 2L), (3L, 10L), (4L, 6L))
      .toDF("doc_id", "len")
    val got = Sampling.packingFragmentation(df, col("len"),
      blockSize = 10, bucketSize = 2)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((5L, 2L, 3L, 30L)), got.toString)
    // a doc ENDING exactly on a boundary does not split; one starting
    // on a boundary with len == blockSize doesn't either
    val df2 = Seq((0L, 10L), (1L, 10L), (2L, 5L)).toDF("doc_id", "len")
    val got2 = Sampling.packingFragmentation(df2, col("len"),
      blockSize = 10, bucketSize = 2)
      .as[(Long, Long, Long, Long)].head()
    assert(got2 == ((3L, 0L, 3L, 25L)), got2.toString)
  }

  test("padding/packing censuses match plain Scala models on fuzzed " +
      "lengths") {
    def lcg(seed: Long): Iterator[Long] = Iterator.iterate(seed)(s =>
      s * 6364136223846793005L + 1442695040888963407L)
    val lens = lcg(42).drop(1).take(300)
      .map(v => ((v >>> 33) % 40) + 1).toSeq
    val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "len")
    // packingFragmentation vs running-sum model
    val (bs, bkt) = (32, 16)
    val prefixes = lens.scanLeft(0L)(_ + _).init
    val nSplit = prefixes.zip(lens)
      .count { case (p, l) => p % bs + l > bs }.toLong
    val total = lens.sum
    val gotP = Sampling.packingFragmentation(df, col("len"), bs, bkt)
      .as[(Long, Long, Long, Long)].head()
    assert(gotP == ((300L, nSplit,
      math.ceil(total.toDouble / bs).toLong, total)), gotP.toString)
    // paddingWasteCensus vs batch-max model (both strategies)
    val (b, w) = (8, 16)
    def billed(ordered: Seq[Long]): Long =
      ordered.grouped(b).map(g => g.length * g.max).sum
    val arrival = billed(lens)
    val bucketed = lens.zipWithIndex
      .groupBy { case (l, _) => l / w }.toSeq
      .map { case (_, g) =>
        billed(g.sortBy { case (l, i) => (l, i) }.map(_._1)) }
      .sum
    val gotW = Sampling.paddingWasteCensus(df, col("len"), b, w)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(gotW == Map("arrival" -> arrival, "bucketed" -> bucketed),
      s"$gotW vs arrival=$arrival bucketed=$bucketed")
  }

  test("paddingWasteCensus: arrival pays for length mixing, bucketed " +
      "pays only within a length class; partial batches count n, " +
      "not batchSize") {
    // lens 1, 9, 1, 9, 1 (ids 0..4), batch 2, bucket width 10
    val df = Seq(1, 9, 1, 9, 1).zipWithIndex
      .map { case (k, i) => (i.toLong, k.toLong) }
      .toDF("doc_id", "len")
    val got = Sampling.paddingWasteCensus(df, col("len"),
      batchSize = 2, bucketWidth = 10)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // arrival: {1,9} -> 2*9, {1,9} -> 2*9, {1} -> 1*1 (partial pays
    // its own n, not batchSize): padded 37, real 21
    assert(got("arrival") == ((3L, 21L, 37L)), got.toString)
    // bucketed (all in bucket 0, sorted 1,1,1,9,9):
    // {1,1} -> 2, {1,9} -> 18, {9} -> 9: padded 29
    assert(got("bucketed") == ((3L, 21L, 29L)), got.toString)
    // width 5 separates the classes entirely: {1,1},{1} + {9,9}
    // -> padded == 2 + 1 + 18 + ... = real + 0 waste
    val sep = Sampling.paddingWasteCensus(df, col("len"),
      batchSize = 2, bucketWidth = 5)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(sep("bucketed") == ((3L, 21L, 21L)), sep.toString)
    intercept[IllegalArgumentException](
      Sampling.paddingWasteCensus(df, col("len"), 0, 5))
    intercept[IllegalArgumentException](
      Sampling.paddingWasteCensus(df, col("len"), 2, 0))
  }

  test("tokenBudgetPack equals the global greedy prefix") {
    // budget 50 crosses inside rank 1: rank 2 (30 toks) keeps whole
    // via the no-window fast path, rank 1 is the boundary bucket
    // (doc 10 fits at cum 45, doc 11 overflows at 55 and 12 stays
    // past the line), rank 0 is dropped without a scan.
    val df = Seq(
      (1L, 2L, 10L), (2L, 2L, 10L), (3L, 2L, 10L),
      (10L, 1L, 15L), (11L, 1L, 10L), (12L, 1L, 15L),
      (20L, 0L, 5L)).toDF("doc_id", "r", "n")
    val got = Sampling.tokenBudgetPack(df, col("r"), col("n"), 50L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 10L))
    // fuzzed instance vs an independent sequential model of the
    // global (rank DESC, doc_id) running-sum prefix
    val fuzz = (0L until 200L).map(i => (i, (i * 7) % 5, (i * 13) % 23 + 1))
    val budget = 600L
    var cum = 0L
    val expect = fuzz.sortBy { case (id, r, _) => (-r, id) }
      .filter { case (_, _, n) => cum += n; cum <= budget }
      .map(_._1).toSet
    val gotF = Sampling.tokenBudgetPack(
      fuzz.toDF("doc_id", "r", "n"), col("r"), col("n"), budget)
      .select("doc_id").as[Long].collect().toSet
    assert(gotF == expect)
  }

  test("redact replaces each PII category with its token") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org today"),
      (2L, "fetch https://example.com/a/b?q=1#frag now"),
      (3L, "server 192.168.10.1 and backup 10.0.0.254"),
      (4L, "call +6281234567890 anytime"),
      (5L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = Redaction.piiScrub(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(out(0)._6 == "mail me at <EMAIL> today")
    assert(out(1)._6 == "fetch <URL> now")
    assert(out(2)._6 == "server <IP> and backup <IP>")
    assert(out(3)._6 == "call <PHONE> anytime")
    assert(out(4)._6 == "nothing sensitive here")
    // counts line up with the categories: n_url, n_email, n_ip, n_phone
    assert(out(0)._3 == 1 && out(0)._2 == 0)
    assert(out(1)._2 == 1)
    assert(out(2)._4 == 2)
    assert(out(3)._5 == 1)
    assert(out(4).productIterator.toSeq.slice(1, 5) == Seq(0L, 0L, 0L, 0L))
  }

  test("piiScrub counts are exact when raw text contains literal tokens") {
    // Adversarial inputs for the count-from-output optimization: raw
    // text already holding replacement tokens, tokens adjacent to real
    // PII, and angle brackets hugging a real match. The count must
    // equal what regexp_count on the RAW text reports in every case.
    val rows = Seq(
      (1L, "plain <URL> token, no real url"),
      (2L, "<URL> then real https://x.org/p"),
      (3L, "<EMAIL><EMAIL> and a@b.co plus <IP>"),
      (4L, "<EMAILnot@a.token.com> bracket-hugged email"),
      (5L, "<PHONE>+6281234567 <PHONE>"),
      (6L, "token soup <URL><EMAIL><IP><PHONE>"),
      (7L, "https://a.io/<URL> url then token"))
    val df = rows.toDF("doc_id", "text")
    val got = Redaction.piiScrub(df).orderBy("doc_id")
    val want = df.orderBy("doc_id").select(
      col("doc_id") +: Redaction.Patterns.map { case (cat, pat, _) =>
        regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$cat")
      }: _*)
    val gw = got.select("doc_id", "n_url", "n_email", "n_ip", "n_phone")
      .collect().toSeq.zip(want.collect().toSeq)
    for ((g, w) <- gw) assert(g == w, s"counts diverge: got $g want $w")
    // and pre-existing tokens pass through the redacted text verbatim
    val r1 = got.filter(col("doc_id") === 1).head.getAs[String]("redacted")
    assert(r1 == "plain <URL> token, no real url")
  }

  test("piiScrub counts == regexp_count reference on fuzzed token soup") {
    // Generative version of the adversarial test above (same pattern as
    // the sampler fuzz-parity): seeded random documents assembled from
    // replacement tokens, real PII, token fragments, angle brackets and
    // noise — the full collision space for the count-from-output trick.
    val rnd = new scala.util.Random(4242L)
    val pieces = Seq(
      "<URL>", "<EMAIL>", "<IP>", "<PHONE>",           // literal tokens
      "https://ex.org/a", "a.b@c.de", "1.2.3.4", "+628123456",  // real PII
      "<URL", "URL>", "<EMAILx@y.zz>", "<", ">",       // fragments/hugs
      "plain", "words", " ", "")
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(pieces(rnd.nextInt(pieces.size))).mkString(""))
    }.toDF("doc_id", "text")
    val got = Redaction.piiScrub(docs)
      .select("doc_id", "n_url", "n_email", "n_ip", "n_phone")
    // Reference semantic: the number of replacements each stage of the
    // SEQUENTIAL chain performs (regexp_count on the partially-redacted
    // text entering that stage) — on adversarial soup an earlier
    // category can legitimately consume a later category's characters
    // (an email match can swallow "+628123456"), so counting each
    // pattern independently on the raw text is NOT the contract.
    val staged = Redaction.Patterns.foldLeft(docs) {
      case (df, (cat, pat, tok)) =>
        df.withColumn(s"n_$cat",
          regexp_count(col("text"), lit(pat)).cast("long"))
          .withColumn("text", regexp_replace(col("text"), pat, tok))
    }
    val want = staged.select(
      col("doc_id") +: Redaction.Patterns.map { case (cat, _, _) =>
        col(s"n_$cat")
      }: _*)
    val mismatches = got.as("g").join(want.as("w"), "doc_id")
      .filter(col("g.n_url") =!= col("w.n_url") ||
        col("g.n_email") =!= col("w.n_email") ||
        col("g.n_ip") =!= col("w.n_ip") ||
        col("g.n_phone") =!= col("w.n_phone"))
      .join(docs, "doc_id")
    assert(mismatches.isEmpty,
      s"count divergence:\n${mismatches.collect().mkString("\n")}")
  }

  test("withFakePii injects on the doc_id-keyed subsets") {
    val df = (0L to 20L).map(i => (i, "base")).toDF("doc_id", "text")
    val out = Redaction.piiScrub(Redaction.withFakePii(df))
    val row15 = out.filter(col("doc_id") === 15).head() // %3 and %5
    assert(row15.getAs[Long]("n_email") == 1)
    assert(row15.getAs[Long]("n_url") == 1)
    assert(row15.getAs[Long]("n_ip") == 0)
    val row14 = out.filter(col("doc_id") === 14).head() // %7 only
    assert(row14.getAs[Long]("n_ip") == 1)
    assert(row14.getAs[Long]("n_email") == 0)
  }

  // ---------------------------------------------------------- Components

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val labeled = Components.connectedComponents(
      edges.toDF("src", "dst"), nodes.toDF("node"))
    labeled.as[(Long, Long)].collect().toMap
  }

  test("components: two clusters plus a singleton") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 99L -> 99L))
  }

  test("components: empty edge set yields all singletons") {
    val got = cc(Seq.empty, Seq(1L, 5L, 9L))
    assert(got == Map(1L -> 1L, 5L -> 5L, 9L -> 9L))
  }

  test("components: a long chain converges via pointer jumping") {
    // path 0-1-2-...-63: diameter 63 >> maxIter 20 — plain propagation
    // would NOT converge; pointer jumping must (O(log n) rounds).
    val n = 64L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = cc(edges, 0L until n)
    assert(got.values.toSet == Set(0L), "whole chain is one component")
  }

  test("components: maxIter exhaustion reports unconverged count and last sums") {
    // maxIter=1 can never satisfy the sum-fixpoint test (it needs two
    // sums to compare), so this deterministically exercises the
    // failure path. Path 1-2-3-4 after one round+jump labels nodes
    // 2,3,4 away from their identity seed -> 3 changed nodes.
    val e = intercept[IllegalStateException] {
      Components.edgeComponents(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"),
        maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge in 1 round(s)"))
    assert(e.getMessage.contains("3 edge-incident node(s)"))
    assert(e.getMessage.contains("last two label sums"))
  }

  test("components: maxIter <= 0 is rejected up front, not an NPE") {
    val err = intercept[IllegalArgumentException] {
      Components.edgeComponents(
        Seq((1L, 2L)).toDF("src", "dst"), maxIter = 0)
    }
    assert(err.getMessage.contains("maxIter must be >= 1"))
  }

  test("components matches a reference union-find on a random-ish graph") {
    // deterministic pseudo-random edges (no RNG seed plumbing needed)
    val nodes = (0L until 200L).toSeq
    val edges = nodes.collect {
      case i if (i * 2654435761L) % 7 == 0 => (i, (i * 31 + 17) % 200)
    }.filter { case (a, b) => a != b }
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = nodes.map(n => n -> find(n)).toMap
    assert(cc(edges, nodes) == expect)
  }

  // -------------------------------------------------- plan shape / misc

  test("sampling and redaction are scan-shaped: no Exchange in the plan") {
    val df = (0 until 100).map(i => (i.toLong, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
    for ((name, plan) <- Seq(
        "sample" -> Sampling.stratifiedSample(df, col("lang"), col("text"),
          Seq("en" -> 0.5), 0.1).queryExecution.executedPlan.toString,
        "redact" -> Redaction.piiScrub(df)
          .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("Exchange"),
        s"$name must not shuffle — pure per-row predicate/projection:\n$plan")
    }
  }

  test("incrementalNew keeps only content absent from the corpus") {
    val corpus = Seq(1L -> "old doc", 2L -> "kept doc").toDF("doc_id", "text")
    val fresh = Seq(
      10L -> " OLD   doc ", // dup of corpus 1 after normalization
      11L -> "genuinely new").toDF("doc_id", "text")
    val got = TextDedup.incrementalNew(fresh, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L))
  }

  test("contaminationHits finds n-gram overlap with the eval set only") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training content here"),
      (3L, "quick brown fox appears again elsewhere"))
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "a quick brown fox story")).toDF("doc_id", "text")
    val got = TextDedup.contaminationHits(train, evalSet, n = 3)
      .as[(Long, Long, Long)].collect().toSet
    // "quick brown fox" is the one shared trigram for docs 1 and 3
    assert(got == Set((1L, 100L, 1L), (3L, 100L, 1L)))
  }

  test("edgeComponents == connectedComponents minus the singletons") {
    // the contract componentSizes-style consumers rely on: every edge
    // endpoint is in a cluster of size >= 2, so dropping the node
    // universe loses exactly the singleton back-fill rows
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L)
    val full = Components.connectedComponents(
      edges.toDF("src", "dst"), nodes.toDF("node"))
      .as[(Long, Long)].collect().toSet
    val edgeOnly = Components.edgeComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(edgeOnly == full - ((99L, 99L)))
  }

  test("decontaminateDrop keeps exactly the docs with no shared gram") {
    val train = Seq(
      1L -> "the quick brown fox jumps",
      2L -> "completely different words here",
      3L -> "another quick brown fox text").toDF("doc_id", "text")
    val evalSet = Seq(100L -> "quick brown fox").toDF("doc_id", "text")
    val kept = TextDedup.decontaminateDrop(train, evalSet, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("componentSizes summarizes non-singleton clusters") {
    val labeled = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("node", "component")
    val sizes = Components.componentSizes(labeled)
      .as[(Long, Long, Long)].collect().toList
    assert(sizes == List((1L, 3L, 1L)))
  }

  test("shardLayout: two-level pos equals the plain md5-sort reference") {
    // the decomposition (hash-prefix buckets + offsets) must agree
    // with a direct per-shard sort rank for every nShards
    val texts = (0 until 400).map(i => i.toLong -> s"fuzz body $i")
    val df = texts.toDF("doc_id", "text")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    for (n <- Seq(1, 4, 256)) {
      val expect = texts
        .map { case (id, t) => (id, md5hex(t)) }
        .groupBy { case (_, h) =>
          (Integer.parseInt(h.substring(0, 2), 16) % n) }
        .flatMap { case (s, rows) =>
          rows.sortBy { case (id, h) => (h, id) }.zipWithIndex
            .map { case ((id, _), i) => id -> ((s, i + 1L)) } }
      val got = Sampling.shardLayout(df, col("text"), n)
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expect, s"nShards=$n")
    }
  }

  test("shardLayout: exhaustive, near-uniform, deterministic, dense ranks") {
    val df = (0 until 2048).map(i => (i.toLong, s"document body $i"))
      .toDF("doc_id", "text")
    val out = Sampling.shardLayout(df, col("text"), nShards = 16)
      .as[(Long, Int, Long)].collect()
    assert(out.length == 2048, "every row must be placed")
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 16).toSet))
    // md5 is uniform: 2048/16 = 128 ± 5 sd (sd ≈ 11)
    byShard.foreach { case (s, rows) =>
      assert(math.abs(rows.length - 128) < 56, s"shard $s: ${rows.length}")
    }
    // positions are a dense 1..n rank within each shard
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s ranks not dense")
    }
    // content-keyed: a rerun (and any repartitioning) gives byte-equal
    // layout
    val again = Sampling.shardLayout(df.repartition(7), col("text"), 16)
      .as[(Long, Int, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](
      Sampling.shardLayout(df, col("text"), nShards = 10))
  }

  test("writeTrainingShards: one file per shard, hash-ordered inside") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards-").toString
    val df = (0 until 600).map(i => (i.toLong, s"training document $i"))
      .toDF("doc_id", "text")
    Sampling.writeTrainingShards(df, col("text"), dir, nShards = 16)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    }
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty && shardDirs.length <= 16)
    var total = 0L
    for (sd <- shardDirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      // all rows of a shard live in one task's partition (hash of the
      // shard value), so each directory holds exactly one file — the
      // unit a trainer streams sequentially
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
      // single-file read on one partition preserves writer row order
      val rows = spark.read.parquet(files.head.getAbsolutePath)
        .select("doc_id", "text")
        .as[(Long, String)].collect()
      total += rows.length
      val keys = rows.map { case (id, t) => (md5hex(t), id) }
      assert(keys.sortBy(identity).toSeq == keys.toSeq,
        s"${sd.getName} not hash-ordered")
    }
    assert(total == 600, s"rows lost or duplicated: $total")
    // layout agrees with the queryable shardLayout view of the same key
    val layout = Sampling.shardLayout(df, col("text"), 16)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    for (sd <- shardDirs) {
      val s = sd.getName.stripPrefix("shard=").toInt
      val ids = spark.read.parquet(sd.getAbsolutePath)
        .select("doc_id").as[Long].collect().toSet
      assert(ids.forall(layout(_) == s), s"shard $s content mismatch")
    }
  }

  test("classifierScore: hand-checked linear score, weight subset, guard") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "the cat and the dog ran to the park with care."),
      (2L, "12345 67890 !!! ??? 555 000 111 222")).toDF("doc_id", "text")
    // doc 1: words=11, stop hits: the×3 + and + to + with = 6,
    // punct: 1 ('.'), digits: 0 -> -40 + 11 + 90 - 3 = 58 -> keep
    val r1 = TextAnalysis.classifierScore(df).filter(col("doc_id") === 1)
      .select("score", "keep").as[(Long, Int)].collect().head
    assert(r1 == ((58L, 1)))
    // doc 2: digit soup scores deep negative -> dropped
    val r2 = TextAnalysis.classifierScore(df).filter(col("doc_id") === 2)
      .select("score", "keep").as[(Long, Int)].collect().head
    assert(r2._1 < 0 && r2._2 == 0)
    // single-feature model: only the listed weights contribute
    val solo = TextAnalysis.classifierScore(df,
      (0L, Map("word_cnt" -> 2L)))
      .filter(col("doc_id") === 1).select("score").as[Long].collect().head
    assert(solo == 22L)
    intercept[IllegalArgumentException](
      TextAnalysis.classifierScore(df, (0L, Map("nope" -> 1L))))
  }

  test("curation funnel counts are monotone and end at the v2 output size") {
    val sfDir = "/root/testdata/sf0.001"
    val row = graft.SparkEntry.queries("curation_funnel")(spark, sfDir)
      .collect().head
    val Seq(in, gop, page, line, dedup) = Seq("n_input", "n_gopher",
      "n_page", "n_line_nonempty", "n_deduped").map(row.getAs[Long])
    assert(in >= gop && gop >= page && page >= line && line >= dedup,
      s"funnel not monotone: $in $gop $page $line $dedup")
    assert(dedup > 0, "funnel must keep something on the fixture")
    val v2Rows = graft.SparkEntry.queries("curation_e2e_v2")(spark, sfDir)
      .count()
    assert(dedup == v2Rows,
      s"funnel end ($dedup) must equal curation_e2e_v2 output ($v2Rows)")
  }
}
