package graft

/** The driver-contract smoke, run locally: `entry` exercises both
  * extractor families end-to-end, and every oracle key has a matching
  * query (the inverse need not hold — non-SQL-expressible ops are
  * rows-only by contract).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry runs the real dispatch pipeline and yields both families") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val byEntity = rows.groupBy(_.getAs[String]("entity"))
      .view.mapValues(_.map(_.getAs[String]("code")).toSet).toMap
    assert(byEntity("province") == Set("11"))
    assert(byEntity("regency") == Set("11.01"))
    assert(byEntity("district") == Set("11.01.01"))
    assert(byEntity("village") == Set("11.01.01.2001"))
    assert(byEntity("island") == Set("11.01.40001", "11.01.40002"))
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("curation_e2e keeps its one-shuffle shape with projected gates") {
    val plan = SparkEntry.queries("curation_e2e")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // exactly one Exchange (the dedup window shuffle) — the quality/
    // language/sample gates are per-row and must not add any
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly one Exchange:\n$plan")
    // the gates must stay a projected flag (codegen subexpr
    // elimination), not get pushed back into a Filter predicate: the
    // barrier column survives only if the plan still references it
    assert(plan.contains("monotonically_increasing_id"),
      s"pushdown barrier disappeared — gates likely re-inlined:\n$plan")
  }

  test("curation_e2e_v2 runs every published gate before its single shuffle") {
    val plan = SparkEntry.queries("curation_e2e_v2")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // two Exchanges total (r21): the dedup window PLUS the
    // scale-guarded scan spread (a RoundRobinPartitioning repartition
    // that parallelizes the gate expressions off the single-row-group
    // fixture scan — measured 1.42 → 0.81 s at sf0.1; a no-op at
    // production scan parallelism). The Gopher/C4-page flags and the
    // per-row C4 line clean must not add any beyond those.
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") == 2,
      s"expected exactly two Exchanges (spread + dedup window):\n$plan")
    assert(plan.contains("RoundRobinPartitioning"),
      s"the spread exchange should be round-robin:\n$plan")
    assert(plan.contains("monotonically_increasing_id"),
      s"pushdown barrier disappeared — gates likely re-inlined:\n$plan")
  }

  test("pipeline e2e plans keep their pinned shuffle budget and no SMJ") {
    // The two extractor pipelines are among the most expensive bench
    // rows; PLANS.md audits their shape, but only a pin makes a shape
    // regression (a lost broadcast decaying into a SortMergeJoin, or
    // dispatch/window-dedup growing an extra shuffle) fail a test
    // instead of reading as bench noise. Counts are shuffle Exchanges
    // only — BroadcastExchange (small dims) and ReusedExchange are
    // deliberate and excluded.
    // NOTE these are STATIC-plan counts: extractAllShared's one
    // repartition prints once per consuming branch here (area 3×,
    // island 2×) and collapses to a single exchange + ReusedExchange
    // at runtime — the "e2e pipelines scan once and reuse" spec below
    // pins that.
    val shuffles = raw"(?<!Broadcast|Reused)Exchange".r
    for ((name, pinned) <- Seq(
        "pipeline_area_e2e" -> 7, "pipeline_island_e2e" -> 5)) {
      val plan = SparkEntry.queries(name)(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"$name grew an SMJ:\n$plan")
      val n = shuffles.findAllIn(plan).size
      assert(n == pinned,
        s"$name: $n shuffle Exchanges, pinned $pinned:\n$plan")
    }
  }

  test("tfidf/surprisal single-scan exchange reuse holds in the final plan") {
    // Both queries branch three ways off one tokenize aggregate and
    // depend on the always-true-filter trick keeping those branches
    // canonically EQUAL, so AQE reuses one shuffle stage and the
    // corpus is scanned and tokenized once. Column pruning regressions
    // silently break the match — the query stays correct but scans and
    // tokenizes the corpus three times, which read as bench noise
    // until pinned here. (Round-9 provenance: the r8→r7 driver drift
    // on tfidf_top_terms was investigated with ReuseAudit and an A/B
    // against the r7 commit on one machine — the reuse was intact and
    // the medians statistically equal; this pin keeps it that way.)
    for (name <- Seq("tfidf_top_terms", "unigram_surprisal")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      // drive THIS QueryExecution to its final adaptive plan (a write
      // would execute a clone, leaving isFinalPlan=false here)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val fin = df.queryExecution.executedPlan.toString
        .split("\\+\\- == Initial Plan ==").head
      val scans = "FileScan|Scan parquet".r.findAllIn(fin).size
      assert(scans == 1, s"$name scans the corpus $scans times:\n$fin")
      val stages = "(ShuffleQueryStage|BroadcastQueryStage) \\d+".r
        .findAllIn(fin).toSeq
      val reused = "ReusedExchange".r.findAllIn(fin).size +
        (stages.size - stages.distinct.size)
      assert(reused >= 2,
        s"$name lost its exchange reuse (reused=$reused):\n$fin")
    }
  }

  test("e2e pipelines scan once and reuse the shared exchange at runtime") {
    // The island pipeline dropped its explicit repartition on the
    // strength of AQE collapsing extractAllShared's per-branch
    // repartition prints into one exchange + ReusedExchange — if that
    // reuse silently breaks, the synthesizing pipeline re-runs per
    // branch and only bench noise would show it (ADVICE r10). Floors
    // measured with graft.tools.ReuseAudit at sf0.001: area reused=3,
    // island reused=1, scans=1 both.
    for ((name, minReused) <- Seq(
        "pipeline_area_e2e" -> 3, "pipeline_island_e2e" -> 1)) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val fin = df.queryExecution.executedPlan.toString
        .split("\\+\\- == Initial Plan ==").head
      val scans = "FileScan|Scan parquet".r.findAllIn(fin).size
      assert(scans == 1, s"$name scans its source $scans times:\n$fin")
      val stages = "(ShuffleQueryStage|BroadcastQueryStage) \\d+".r
        .findAllIn(fin).toSeq
      val reused = "ReusedExchange".r.findAllIn(fin).size +
        (stages.size - stages.distinct.size)
      assert(reused >= minReused,
        s"$name lost exchange reuse (reused=$reused < $minReused):\n$fin")
    }
  }

  test("star_revenue keeps its star shape: broadcast dims, no SMJ") {
    // The Q5-shape rollup is the canonical star-join plan: the two
    // fact tables shuffle, every dimension rides a broadcast. A dim
    // decaying into a SortMergeJoin at 100 TB is the classic silent
    // regression — pin it.
    val plan = SparkEntry.queries("star_revenue")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"star grew an SMJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected broadcast dims, got $bhj BHJs:\n$plan")
  }

  test("per-row quality operators plan with zero exchanges") {
    // gopher_quality, line_dedup_within_doc and quality_classifier
    // are scan-shaped by design (per-row verdicts, no corpus-wide
    // stage) — a shuffle appearing in any of them is a regression,
    // not noise. c4_page_filter (r21) carries exactly ONE deliberate
    // exchange: the scale-guarded round-robin scan spread (0.98 →
    // 0.85 s at sf0.1; a no-op at production scan parallelism) — its
    // gates stay per-row, so anything beyond that one is a regression.
    for (name <- Seq("gopher_quality",
        "line_dedup_within_doc", "quality_classifier")) {
      val plan = SparkEntry.queries(name)(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name grew a shuffle:\n$plan")
    }
    val c4 = SparkEntry.queries("c4_page_filter")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(c4.sliding("Exchange".length).count(_ == "Exchange") == 1 &&
      c4.contains("RoundRobinPartitioning"),
      s"c4_page_filter should have exactly the one spread exchange:\n$c4")
  }

  test("planted-mutation regex == token-indexed HOF mutation") {
    // plantedInput swaps every 50th normalized token for the sentinel
    // with one regex pass; the semantic reference is the per-token
    // lambda (pmod(i, 50) == 49). Pin them equal on real corpus text
    // so the recall fixtures can never drift from the definition the
    // floors were measured against.
    import org.apache.spark.sql.functions._
    val norm = graft.ops.TextDedup.normText(col("text"))
    val viaRegex = regexp_replace(norm, "((?:\\S+ ){49})\\S+", "$1zzplantzz")
    val toks = split(norm, " ")
    val viaHof = concat_ws(" ", transform(toks, (t, i) =>
      when(pmod(i, lit(50)) === 49, lit("zzplantzz")).otherwise(t)))
    val bad = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(viaRegex.as("a"), viaHof.as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(bad == 0L)
  }

  test("dedup_report: planted copies hit the content detectors, " +
      "miss the adjacency detector, and the summary adds up") {
    import org.apache.spark.sql.functions._
    val rep = SparkEntry.queries("dedup_report")(
      spark, "/root/testdata/sf0.001").cache()
    try {
      // the mod-17 verbatim copies are ground truth: identical text ⇒
      // exact/line/substring verdicts fire; identical embedding in the
      // same cluster ⇒ semantic fires; but the near-dup candidate
      // window is id-adjacency, so the +10M copies are its structural
      // blind spot — the report must SHOW that as 0, not drop the row
      val copies = rep.filter(col("doc_id") >= 10000000L)
      val n = copies.count()
      assert(n > 0, "no planted copies in the report")
      assert(copies.filter(col("exact_dup") === 1 && col("line_dup") === 1 &&
        col("substr_dup") === 1 && col("sem_dup") === 1 &&
        col("neardup_dup") === 0).count() == n)
      // cross-row consistency: flag count column matches its parts
      assert(rep.filter(col("n_flags") =!= col("exact_dup") +
        col("line_dup") + col("substr_dup") + col("neardup_dup") +
        col("sem_dup")).count() == 0)
      // summary rows are the aggregate of the detail rows
      val sum = SparkEntry.queries("dedup_report_summary")(
        spark, "/root/testdata/sf0.001").collect().head
      assert(sum.getAs[Long]("n_docs") == rep.count())
      assert(sum.getAs[Long]("exact_dups") ==
        rep.agg(org.apache.spark.sql.functions.sum("exact_dup"))
          .collect().head.getLong(0))
      assert(sum.getAs[Long]("flagged_any") ==
        rep.filter(col("n_flags") > 0).count())
    } finally rep.unpersist()
  }

  test("no final schema carries a >18-digit decimal (driver-hash hazard)") {
    // The r15 gate failure class: values beyond int64/exact-float64
    // range replay bit-identically yet Spark parquet DECIMAL(38,0) and
    // DuckDB HUGEINT canonicalize differently under the driver's
    // hasher. Exact wide arithmetic stays INTERNAL; a final schema
    // must emit digit strings or BIGINT-range values. Schemas come
    // from analysis only — nothing executes.
    import org.apache.spark.sql.types._
    def wide(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.flatMap(f => wide(f.dataType, s"$path.${f.name}")).toSeq
      case a: ArrayType => wide(a.elementType, s"$path[]")
      case m: MapType =>
        wide(m.keyType, s"$path.key") ++ wide(m.valueType, s"$path.value")
      case _ => Nil
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, "/root/testdata/sf0.001").schema.fields
          .flatMap(f => wide(f.dataType, s"$name.${f.name}"))
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("curation_attributes reconciles EXACTLY with curation_funnel " +
      "and curation_e2e_v2 (VERDICT r19 #5's done-criterion)") {
    import org.apache.spark.sql.functions._
    import graft.SparkTestSession.spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val attrs = SparkEntry.queries("curation_attributes")(spark, dir)
    val got = attrs.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("gopher_fail") === 0, 1L).otherwise(0L)),
      sum(when(col("gopher_fail") === 0 && col("page_fail") === 0, 1L)
        .otherwise(0L)),
      sum(when(col("gopher_fail") === 0 && col("page_fail") === 0 &&
        col("line_empty") === 0, 1L).otherwise(0L)),
      sum(when(col("survived") === 1, 1L).otherwise(0L)))
      .as[(Long, Long, Long, Long, Long)].collect().head
    val f = SparkEntry.queries("curation_funnel")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == f, s"attributes roll-up $got != funnel $f")
    val e2eRows = SparkEntry.queries("curation_e2e_v2")(spark, dir).count()
    assert(got._5 == e2eRows,
      s"survivors ${got._5} != curation_e2e_v2 rows $e2eRows")
    // the mask is exactly its bits
    val badMask = attrs.filter(col("reject_mask") =!=
      col("gopher_fail") + col("page_fail") * 2 + col("exact_dup") * 4)
      .count()
    assert(badMask == 0L)
  }

  test("dedupReportShared: the session API pays ONE five-detector " +
      "build for the report+summary pair and survives sweeps " +
      "(VERDICT r19 #8)") {
    val dir = "/root/testdata/sf0.001"
    val before = SparkEntry.dedupReportBuilds.get()
    val shared = SparkEntry.dedupReportShared(spark, dir)
    assert(shared.count() > 0)                 // "report" consumer
    assert(SparkEntry.dedupReportShared(spark, dir)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).count() == 1) // summary
    val built = SparkEntry.dedupReportBuilds.get() - before
    assert(built == 1L,
      s"expected exactly 1 shared build for the pair, got $built")
    // sweep-resilience: unpersisting every RDD (what Verify/Bench do
    // between queries) must degrade to a silent lineage recompute,
    // not a missing-checkpoint-block crash
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(SparkEntry.dedupReportShared(spark, dir).count() > 0)
    assert(SparkEntry.dedupReportBuilds.get() - before == 1L,
      "a swept cache must recompute through its lineage, not rebuild")
  }

  test("registry sizes are exact (guards against silent Map-key dupes)") {
    // A duplicated key in the Map literal would silently drop an entry;
    // pin the exact counts so that shows up as a test failure.
    assert(SparkEntry.queries.size == 240,
      s"queries: ${SparkEntry.queries.keySet.toSeq.sorted}")
    assert(SparkEntry.oracleSql.size == 240,
      s"oracles: ${SparkEntry.oracleSql.keySet.toSeq.sorted}")
    // the rows-only set is pinned EMPTY since round 10: every query
    // carries an oracle — the two whose raw values aren't
    // SQL-replayable (compression_signal's zlib lengths, r9;
    // simhash_signatures' xxhash64 bits, r10) emit in-band self-audit
    // flags the oracle asserts TRUE instead. Anything new must bring
    // an oracle or a self-audit.
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      Set.empty[String])
  }
}
