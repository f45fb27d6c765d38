package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The one-command curation run on REAL multi-line documents (no
  * synthetic line reconstruction): gates, line cleaning, dedup,
  * redaction, funnel accounting, and the sharded sink.
  */
class RunCurationSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val prose = (1 to 60)
    .map(i => s"the data and model run $i goes to the set with care.")
    .mkString("\n")

  test("curate: gates, dedup, redaction and funnel on hand-built docs") {
    val docs = Seq(
      (1L, prose), // passes every gate
      (2L, prose), // exact duplicate -> dropped by keep-first dedup
      (3L, "short junk"), // fails the Gopher word-count floor
      (4L, prose + "\nlorem ipsum dolor sit amet."), // page gate drops
      (5L, prose + "\ncall +6281234567 now please today.")) // PII line
      .toDF("doc_id", "text")
    val (out, funnel) = RunCuration.curate(docs)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"kept $kept")
    val t5 = out.filter(col("doc_id") === 5L)
      .select("text").as[String].collect().head
    assert(t5.contains("<PHONE>") && !t5.contains("+62812"),
      s"PII survived: $t5")
    assert(funnel() ==
      """{"n_input":5,"n_gopher":4,"n_gates":3,"n_out":2}""", funnel())
    // the classifier gate composes without changing this verdict set
    // (prose scores far positive, junk is already gone at the gates)
    val (out2, _) = RunCuration.curate(docs, classifier = true)
    assert(out2.select("doc_id").as[Long].collect().toSet == kept)
  }

  test("curate + writeTrainingShards: the full run lands on disk") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-run-cur-").toString
    val docs = (0 until 40)
      .map(i => (i.toLong, prose + s"\nextra closing line number $i."))
      .toDF("doc_id", "text")
    val (out, funnel) = RunCuration.curate(docs, redact = false)
    graft.ops.Sampling.writeTrainingShards(out, col("text"), dir, 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == 40)
    assert(back.select("doc_id").distinct().count() == 40)
    assert(funnel().contains("\"n_out\":40"), funnel())
  }

  test("--near-index composes: curated docs already in the prior " +
      "corpus are dropped, the prior corpus is never re-scanned") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cur-idx-").toString
    // prior corpus = one gate-passing doc; index it
    Seq((900L, prose)).toDF("doc_id", "text")
      .write.parquet(s"$dir/prior")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/prior"),
      s"$dir/index")
    // new snapshot: a re-render of the indexed doc (gates pass, but
    // the index gate must drop it) + a genuinely new passing doc
    val fresh = (1 to 60)
      .map(i => s"the fresh data and model run $i goes to the set now.")
      .mkString("\n")
    val docs = Seq((1L, prose.toUpperCase), (2L, fresh))
      .toDF("doc_id", "text")
    val (curated, _) = RunCuration.curate(docs, redact = false)
    assert(curated.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L), "both must pass the content gates")
    val gated = RunDedupIndex.applyFrame(spark, curated, s"$dir/index",
      thresholdPct = 100)
    assert(gated.select("doc_id").as[Long].collect().toSet == Set(2L),
      "the indexed re-render must be dropped by the near-dup gate")
    val plan = gated.queryExecution.executedPlan.toString
    assert(!plan.contains("/prior"), "prior corpus must not be scanned")
  }

  test("splitFrames: exhaustive + disjoint, planted near-dups land " +
      "on ONE side, singleton labels match the plain hash split") {
    val base = (1 to 80)
      .map(i => s"alpha beta gamma delta run $i ends here quietly.")
      .mkString(" ")
    // 24 pairwise-DISJOINT docs (per-doc vocabulary — no shared grams,
    // so they stay singletons) + one near-dup pair (900, 901): same
    // text with one word swapped, Jaccard far above the 0.5 threshold
    val docs = ((0 until 24).map(i =>
      (i.toLong, (1 to 40)
        .map(j => s"t${i}x$j u${i}y$j v${i}z$j").mkString(" ")))
      :+ (900L, base) :+ (901L, base.replace("quietly", "loudly")))
      .toDF("doc_id", "text")
    val (train, evalD) = RunCuration.splitFrames(docs, evalRate = 0.4)
    val tIds = train.select("doc_id").as[Long].collect().toSet
    val eIds = evalD.select("doc_id").as[Long].collect().toSet
    assert((tIds ++ eIds).size == 26 && (tIds & eIds).isEmpty,
      s"not a partition: ${tIds.size}+${eIds.size}")
    assert(tIds.nonEmpty && eIds.nonEmpty, "degenerate split fixture")
    // the planted pair must not straddle
    assert(tIds(900L) == tIds(901L) && eIds(900L) == eIds(901L),
      s"near-dup pair straddled: train=$tIds eval=$eIds")
    // both wear the REPRESENTATIVE's (id 900) own-hash label, and
    // every singleton keeps its plain hashSplit label
    val naive = graft.ops.Sampling.hashSplit(docs, col("text"), 0.4)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(eIds(900L) == (naive(900L) == "eval"), "rep label broken")
    for (i <- 0L until 24L)
      assert(eIds(i) == (naive(i) == "eval"), s"singleton $i moved")
  }
}
