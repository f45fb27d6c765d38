package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Error bounds for the sketch aggregates against exact answers on the
  * real sf0.001 tables — the acceptance check before trusting a sketch
  * at a scale where the exact answer is unaffordable.
  */
class SketchesSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("HLL approx distinct is within the configured rsd band") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(
      approx_count_distinct(col("l_partkey"), 0.02)).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("grouped sketch matches exact per-group cardinalities closely") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val approx = Sketches.approxDistinct(li, "l_returnflag", "l_orderkey")
      .select("l_returnflag", "approx_distinct")
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: exact=$e approx=$a")
    }
  }

  test("sampled sanity audit holds on the gate datasets") {
    // sketch_approx_distinct runs at sf0.01 (correctness) and sf0.1
    // (bench); the in-band approx_ok flag must be true on both — the
    // check is deterministic for fixed data, so this pins it. Also
    // sanity-check the estimator arithmetic: sampled*4 within the
    // combined sampling+sketch error band of the true cardinality.
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val li = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
      val flags = Sketches.approxDistinctSampled(li, "l_returnflag", "l_partkey")
        .select("approx_ok").as[Boolean].collect()
      assert(flags.nonEmpty && flags.forall(identity), s"$sf: $flags")
    }
  }

  test("approx quantiles bracket the exact median") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val qs = li.select(
      Sketches.approxQuantiles(li, "l_extendedprice", Seq(0.25, 0.5, 0.75)))
      .as[Seq[Double]].head()
    assert(qs.length == 3 && qs(0) <= qs(1) && qs(1) <= qs(2))
    val exactMedian = li.stat.approxQuantile("l_extendedprice",
      Array(0.5), 0.0)(0) // accuracy 0 -> exact
    assert(math.abs(qs(1) - exactMedian) / exactMedian < 0.02)
  }

  test("approxQuantilesChecked: GK rank audit holds; exact rank on a " +
      "known sequence; bad args rejected") {
    import org.apache.spark.sql.functions._
    // 1..1000 per group: the true p50/p90 ranks are known exactly, so
    // a bound failure here is a real audit-logic bug, not noise
    val df = (for (g <- Seq("a", "b"); i <- 1 to 1000)
      yield (g, i.toLong)).toDF("g", "v")
    val out = Sketches.approxQuantilesChecked(df, "g", "v",
      pcts = Seq(50, 90), accuracy = 1000)
      .as[(String, Int, Long, Boolean)].collect()
    assert(out.length == 4)
    assert(out.forall(_._4), s"rank audit failed: ${out.mkString(", ")}")
    assert(out.forall(_._3 == 1000L))
    // the audit is not vacuous: an impossible rank interval fails it.
    // Replay the flag arithmetic with rank_le = rank_lt = 0 for p90 on
    // n = 1000 — lower bound needs rank_le >= ~899, so FALSE.
    val acc = 1000L
    val (n, pct, rank) = (1000L, 90L, 0L)
    val lowerHolds = rank * (100L * acc) >=
      pct * acc * n - n * 100L - 100L * acc
    assert(!lowerHolds, "a rank of 0 must violate the p90 lower bound")
    intercept[IllegalArgumentException](
      Sketches.approxQuantilesChecked(df, "g", "v", pcts = Seq(0)))
    intercept[IllegalArgumentException](
      Sketches.approxQuantilesChecked(df, "g", "v", accuracy = 0))
  }

  test("HLL shard states persist to parquet and merge WITHOUT the rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hll-").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Sketches.hllShardStates(li, pmod(col("l_orderkey"), lit(2)),
      "l_returnflag", "l_partkey").write.parquet(s"$dir/states")
    // the production merge: a LATER job reads only the sketch bytes
    val states = spark.read.parquet(s"$dir/states")
    val est = states.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("state"))).as("est"))
    assert(!est.queryExecution.executedPlan.toString.contains("lineitem"),
      "the state merge must not rescan the fact table")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .as[(String, Long)].collect().toMap
    est.as[(String, Long)].collect().foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: exact=$e merged=$a")
    }
    // and the audited form agrees
    val audited = Sketches.hllMergeChecked(states, li,
      "l_returnflag", "l_partkey")
      .select("l_returnflag", "within_bound").as[(String, Boolean)]
      .collect()
    assert(audited.nonEmpty && audited.forall(_._2))
  }

  test("histogram quantile edges: shard-merge invariant and exactly " +
      "the bucket of the true discrete percentile") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val width = 64L
    def stateOf(mod: Int): Seq[org.apache.spark.sql.DataFrame] =
      (0 until mod).map(p => Sketches.histogramState(
        docs.filter(pmod(col("doc_id"), lit(mod)) === p),
        "lang", "n_chars", width))
    val two = Sketches.histogramMergeQuantiles(stateOf(2), "lang",
      Seq(50, 90), width)
      .as[(String, Int, Long, Long)].collect().toSet
    val five = Sketches.histogramMergeQuantiles(stateOf(5), "lang",
      Seq(50, 90), width)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(two == five, "merge must be shard-partitioning invariant")
    // driver-side truth: q_lo is the bucket lower edge of the exact
    // percentile-disc value (smallest v with 100*rank_le >= pct*n)
    val byLang = docs.select("lang", "n_chars").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((lang, pct, rows, qlo) <- two) {
      val vs = byLang(lang)
      assert(rows == vs.length)
      val target = (pct * rows + 99) / 100 // ceil
      val vStar = vs(target.toInt - 1)
      assert(qlo == (vStar / width) * width,
        s"$lang p$pct: edge $qlo vs true value $vStar")
    }
  }

  test("CMS: estimates never undercount, even with forced collisions") {
    // width 4 forces heavy collisions across 200 distinct keys — the
    // one-sided guarantee must survive the adversarial setting
    val keyed = (0 until 200)
      .map(i => (i % 3, s"key$i", (i % 7 + 1).toLong))
      .toDF("shard", "key", "cnt")
    val merged = Sketches.cmsMerge(
      Sketches.cmsShardStates(keyed, depth = 2, width = 4))
    val probes = keyed.select("key").distinct()
    val est = Sketches.cmsEstimate(merged, probes, depth = 2, width = 4)
    val exact = keyed.groupBy("key").agg(sum(col("cnt")).as("exact"))
    val under = est.join(exact, "key")
      .filter(col("est") < col("exact")).count()
    assert(under == 0L, "CMS must never undercount")
  }

  test("CMS merge is linear: sharded states sum to the unsharded state") {
    val keyed = (0 until 500)
      .map(i => (i % 5, s"tok${i % 37}", 1L)).toDF("shard", "key", "cnt")
    val merged = Sketches.cmsMerge(Sketches.cmsShardStates(keyed))
      .as[(Int, Long, Long)].collect().toSet
    val global = Sketches.cmsShardStates(
        keyed.select(lit(0).as("shard"), col("key"), col("cnt")))
      .select("row", "pos", "cnt")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == global, "per-cell sums must equal the global build")
  }

  test("cmsMergeChecked flags hold and an absent probe never " +
      "underestimates zero") {
    val keyed = (0 until 300)
      .map(i => (i % 2, s"w${i % 11}", 1L)).toDF("shard", "key", "cnt")
    val probes = keyed.select("key").distinct()
    val out = Sketches.cmsMergeChecked(keyed, probes)
      .as[(String, Long, Int, Int, Int)].collect()
    assert(out.length == 11)
    assert(out.forall(r => r._3 == 1 && r._4 == 1 && r._5 == 1),
      out.mkString(", "))
    // absent key: estimate is >= 0 by construction (coalesce to 0)
    val ghost = Sketches.cmsEstimate(
      Sketches.cmsMerge(Sketches.cmsShardStates(keyed)),
      Seq("never-inserted").toDF("key"))
      .as[(String, Long)].collect().head
    assert(ghost._2 >= 0L)
  }

  test("hllIntersectChecked: exact on small overlaps, zero on disjoint") {
    // overlap {6..10}: A = 1..10, B = 6..15 — sparse-mode HLL is
    // exact at this size, so inclusion-exclusion lands on 5 and the
    // audit holds with margin
    val facts = ((1 to 10).map(i => ("a", i.toLong)) ++
      (6 to 15).map(i => ("b", i.toLong))).toDF("s", "k")
    val out = Sketches.hllIntersectChecked(facts, "s", "k", "a", "b")
      .as[(Long, Boolean)].collect().head
    assert(out == ((5L, true)), out.toString)
    // disjoint: the estimate must cancel to ~0 against a 0 bound
    val disjoint = ((1 to 10).map(i => ("a", i.toLong)) ++
      (100 to 110).map(i => ("b", i.toLong))).toDF("s", "k")
    val out2 = Sketches.hllIntersectChecked(disjoint, "s", "k", "a", "b")
      .as[(Long, Boolean)].collect().head
    assert(out2 == ((0L, true)), out2.toString)
  }

  test("kmvDiffChecked: sub-k sides are exact; the k-th-minimum " +
      "path stays in bound on a 2000-vs-2001-key difference") {
    // both sides under k = 256: sketches ARE the sets, estimate exact
    val small = ((1 to 40).map(i => ("a", i.toLong)) ++
      (30 to 60).map(i => ("b", i.toLong))).toDF("s", "k")
    val out = Sketches.kmvDiffChecked(small, "s", "k", "a", "b")
      .as[(Long, Boolean)].collect().head
    assert(out == ((29L, true)), out.toString) // 1..29 in a only

    // a = 1..2000, b = 1000..3000 → exact diff 999; both sides beyond
    // k, so the estimate takes the (k−1)·H/m_k path; deterministic
    // hashes ⇒ the 20% bound verdict is stable
    val big = ((1 to 2000).map(i => ("a", i.toLong)) ++
      (1000 to 3000).map(i => ("b", i.toLong))).toDF("s", "k")
    val out2 = Sketches.kmvDiffChecked(big, "s", "k", "a", "b")
      .as[(Long, Boolean)].collect().head
    assert(out2 == ((999L, true)), out2.toString)
  }
}
