package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-snapshot incremental near-dup dedup: verdict semantics at the
  * set-equality and fuzzy thresholds, the index-bucket skew guard, and
  * the operational property the index exists for — a second snapshot
  * runs against the PERSISTED index without ever touching the prior
  * corpus.
  */
class IncrementalNearDupSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  // 60 tokens: long enough that a one-token edit leaves Jaccard ~0.95,
  // which the 8-band/4-row MinHash scheme catches deterministically
  // under the fixed xxhash64 seeds
  private val longText = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearText =
    ((1 to 59).map(i => s"tok$i") :+ "changed").mkString(" ")

  private def oldDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, longText)).toDF("doc_id", "text")

  private def newDocs = Seq(
    // case+whitespace re-render of doc 1: identical normalized form,
    // hence identical shingle SET — dropped even at thresholdPct=100
    (11L, "Alpha  beta GAMMA delta epsilon zeta eta theta iota kappa"),
    // one-token edit of doc 2: Jaccard ~0.95 — dropped at 50, kept at
    // 100 (the set is no longer equal)
    (12L, nearText),
    // genuinely new
    (13L, "completely different text about unrelated matters entirely")
  ).toDF("doc_id", "text")

  test("threshold semantics: set-equality at 100, fuzzy at 50") {
    val (bands, sigs) = TextDedup.nearDupIndex(oldDocs)
    def kept(pct: Int): Set[Long] =
      TextDedup.incrementalNearNew(newDocs, bands, sigs, thresholdPct = pct)
        .select("doc_id").as[Long].collect().toSet
    assert(kept(100) == Set(12L, 13L),
      "at 100 only the set-equal re-render may be dropped")
    assert(kept(50) == Set(13L),
      "at 50 the near variant must be dropped too")
  }

  test("verified pairs carry exact intersection/union gram counts") {
    val (bands, sigs) = TextDedup.nearDupIndex(oldDocs)
    val pairs = TextDedup
      .incrementalNearPairs(newDocs, bands, sigs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // doc 11 vs doc 1: identical 8-gram set
    assert(pairs((11L, 1L)) == ((8L, 8L)))
    // doc 12 vs doc 2: 58 grams each; only the FINAL gram contains the
    // edited 60th token -> 57 shared, union 59
    assert(pairs((12L, 2L)) == ((57L, 59L)))
    assert(!pairs.contains((13L, 1L)) && !pairs.contains((13L, 2L)),
      "the fresh doc must produce no candidate pairs")
  }

  test("maxBucket drops hot index buckets before the join") {
    // five identical prior docs put bucket_n = 5 on every band bucket;
    // a guard at 4 drops them all, so the identical new doc surfaces
    // no candidates and is kept — the skew guard trades recall on
    // degenerate boilerplate for a bounded join, same as the batch path
    val boiler = (1 to 5).map(i => (i.toLong, longText)).toDF("doc_id", "text")
    val (bands, sigs) = TextDedup.nearDupIndex(boiler)
    val fresh = Seq((10L, longText)).toDF("doc_id", "text")
    val keptGuarded = TextDedup.incrementalNearNew(fresh, bands, sigs,
      thresholdPct = 100, maxBucket = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(keptGuarded == Set(10L))
    val keptOpen = TextDedup.incrementalNearNew(fresh, bands, sigs,
      thresholdPct = 100, maxBucket = Int.MaxValue)
      .select("doc_id").as[Long].collect().toSet
    assert(keptOpen.isEmpty)
  }

  test("the incremental run reads ONLY the persisted index, never the " +
      "prior corpus") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ndidx-").toString
    oldDocs.write.parquet(s"$dir/prior_corpus")
    val (bands, sigs) =
      TextDedup.nearDupIndex(spark.read.parquet(s"$dir/prior_corpus"))
    bands.write.parquet(s"$dir/band_index")
    sigs.write.parquet(s"$dir/shingle_index")
    val kept = TextDedup.incrementalNearNew(newDocs,
      spark.read.parquet(s"$dir/band_index"),
      spark.read.parquet(s"$dir/shingle_index"), thresholdPct = 50)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(13L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("prior_corpus"),
      "prior corpus must never be scanned in an incremental run")
    assert(plan.contains("band_index") && plan.contains("shingle_index"),
      "both index tables must feed the incremental run")
  }
}
