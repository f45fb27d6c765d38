package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
}
