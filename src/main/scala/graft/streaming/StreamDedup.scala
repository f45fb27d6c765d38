package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.ops.TextDedup

/** Streaming exact deduplication of a document feed — the "don't ingest
  * what we already saw" operator, as a Structured Streaming stage.
  *
  * Two state regimes, chosen by the caller:
  *
  *  - [[dedupWithinWatermark]] — `dropDuplicatesWithinWatermark` on the
  *    content hash: state is BOUNDED (hashes older than the watermark
  *    are evicted), the correct choice for an unbounded 100 TB/day feed
  *    where "duplicate" means "re-sent within the lateness horizon"
  *    (retries, at-least-once upstreams).
  *  - [[dedupAgainstCorpus]] — a stream-static left-anti join against
  *    the already-ingested corpus hashes: exact global dedup against
  *    history without holding history in streaming state. The static
  *    side is re-planned per micro-batch (so a compacted corpus
  *    snapshot is picked up), and the join is a broadcast when the hash
  *    table fits, a shuffled hash join otherwise.
  *
  * Both key on the md5 of [[TextDedup.normText]] — the same 32-byte
  * canonical key as the batch dedup operators, so batch and streaming
  * agree on what "duplicate" means.
  */
object StreamDedup {

  /** Bounded-state streaming dedup: drop rows whose content hash was
    * already seen within the watermark horizon. `docs` must carry an
    * `ingest_ts` timestamp column.
    */
  def dedupWithinWatermark(
      docs: DataFrame,
      maxLateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(TextDedup.normText(col("text"))))
      .withWatermark("ingest_ts", maxLateness)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Stream-static anti-join dedup: keep only stream rows whose content
    * hash is absent from `corpusHashes` (a static frame with a
    * `text_hash` column, e.g. the output of the batch dedup pass).
    */
  def dedupAgainstCorpus(docs: DataFrame, corpusHashes: DataFrame): DataFrame =
    docs
      .withColumn("text_hash", md5(TextDedup.normText(col("text"))))
      .join(corpusHashes.select(col("text_hash")).distinct(),
        Seq("text_hash"), "left_anti")

  /** Stream-static NEAR-dup gate: drop stream docs that share any
    * MinHash band bucket with the already-ingested corpus — the
    * in-stream version of LSH dedup (the Bloom-over-band-signatures
    * design the big crawl pipelines run at ingest).
    *
    * Shape: the corpus's band hashes aggregate ONCE into a Bloom
    * filter (same `BloomFilterAggregate` machinery as
    * [[graft.ops.BloomPrune]]), attached to the plan as a scalar
    * subquery; each stream doc then evaluates `numBands` codegen'd
    * `might_contain` probes over its own (per-row, fused-native) band
    * array — a STATELESS scan-shaped gate: no streaming state, no
    * join, no shuffle, which is what lets it sit in front of an
    * unbounded feed at any rate.
    *
    * Semantics: sharing a band ⇒ candidate near-dup ⇒ dropped.
    * Bloom false positives (rate set by `expectedItems`) can drop a
    * non-dup — the usual, deliberate trade for a dedup GATE (a lost
    * true near-dup costs training quality; a rare lost clean doc
    * costs nothing at corpus scale). No false negatives: a doc
    * sharing a band with the corpus is always dropped.
    */
  def nearDedupAgainstCorpus(
      docs: DataFrame,
      corpus: DataFrame,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      expectedItems: Long = 1000000L): DataFrame = {
    def bandsOf(text: Column): Column =
      graft.functions.MinHashExprs.minHashBands(
        TextDedup.shingles(text, shingleSize), numHashes, rowsPerBand)
    // The Bloom key mixes the BAND INDEX into the band hash —
    // xxhash64(band_idx, band_hash) — matching minHashCandidates'
    // (band_idx, band_hash) bucket key exactly: a stream doc's band i
    // only matches a corpus doc's band i, never band j. Inserting the
    // bare band hash would add a cross-band false-positive term beyond
    // the Bloom's own rate (tiny — it needs an xxhash64 collision
    // across different seed sets — but a silent deviation from the
    // batch semantics).
    val corpusHashes = corpus
      .select(posexplode(bandsOf(col("text"))).as(Seq("band_idx", "bh")))
      .select(xxhash64(col("band_idx"), col("bh")).as("h"))
    nearDedupAgainstBandHashes(docs, corpusHashes,
      numHashes, rowsPerBand, shingleSize, expectedItems)
  }

  /** [[nearDedupAgainstCorpus]] fed by the PERSISTED band index
    * ([[graft.tools.RunDedupIndex]]'s `band_index` table: `(doc_id,
    * band_idx, band_hash)`) instead of corpus text — the streaming
    * face of the index lifecycle: the weekly batch job builds and
    * updates the index, and the ingest stream gates against the SAME
    * index without EVER re-shingling a corpus document (the index
    * rows are 12 bytes each; the Bloom build scans only them). Band
    * keys are identical to the batch path by construction, so a doc
    * this gate passes is exactly a doc the batch
    * `incrementalNearNew` would surface no candidates for (minus
    * Bloom false positives).
    */
  def nearDedupAgainstIndex(
      docs: DataFrame,
      bandIndex: DataFrame,
      numHashes: Int = 32,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      expectedItems: Long = 1000000L): DataFrame =
    nearDedupAgainstBandHashes(docs,
      bandIndex.select(
        xxhash64(col("band_idx"), col("band_hash")).as("h")),
      numHashes, rowsPerBand, shingleSize, expectedItems)

  /** Shared gate body: aggregate the given `(band_idx, band_hash)`
    * key hashes into ONE Bloom filter (scalar subquery — evaluated
    * once, shipped to every task), then drop any stream doc whose own
    * band array probes positive on any band. Stateless and
    * shuffle-free on the stream side.
    */
  private def nearDedupAgainstBandHashes(
      docs: DataFrame,
      keyHashes: DataFrame,
      numHashes: Int,
      rowsPerBand: Int,
      shingleSize: Int,
      expectedItems: Long): DataFrame = {
    val numBands = numHashes / rowsPerBand
    def bandsOf(text: Column): Column =
      graft.functions.MinHashExprs.minHashBands(
        TextDedup.shingles(text, shingleSize), numHashes, rowsPerBand)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col("h")))), expectedItems)
    val bloomDf = keyHashes.agg(
      ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
    val bloom = ScalarSubquery(bloomDf.queryExecution.analyzed)
    val hit = (1 to numBands).map { i =>
      ColumnBridge.column(BloomFilterMightContain(bloom,
        new XxHash64(Seq(ColumnBridge.expression(
          xxhash64(lit(i - 1), element_at(col("__bands"), i)))))))
    }.reduce(_ || _)
    docs.withColumn("__bands", bandsOf(col("text")))
      .filter(!hit)
      .drop("__bands")
  }
}
