package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Redaction, TextAnalysis}

/** The curation pipeline at INGEST time — the streaming face of
  * [[graft.tools.RunCuration]]: every quality stage is stateless
  * per-row (the same operator bodies as batch, parity-pinned in
  * StreamDedupSpec), so the only state in the whole query is the
  * watermark-bounded dedup — O(docs-per-lateness-horizon) hashes, the
  * exact streaming analog of the batch keep-first window. A corpus
  * built batch-side can additionally pre-drop via the stream-static
  * gates in [[StreamDedup]] (exact anti-join + Bloom near-dup).
  *
  * Stage order matches batch: gates → line clean → dedup → redact.
  * Dedup hashes the CLEANED text, so a boilerplate-only difference
  * between two documents does not defeat it — identical to
  * RunCuration's behavior.
  */
object StreamCuration {

  /** Gate + clean + watermark-dedup + redact a document stream with
    * (ingest_ts TIMESTAMP, doc_id BIGINT, text STRING). Returns
    * (ingest_ts, doc_id, text) survivors with PII redacted.
    * `dropDamaged` prepends the encoding-damage gate (mojibake /
    * U+FFFD telltales, [[TextAnalysis.encodingDamaged]]) — the
    * CCNet-style ordering where decode casualties die before any
    * quality heuristic wastes cycles scoring them; stateless like
    * every other gate, so it adds nothing to the query's state.
    */
  def curateStream(
      docs: DataFrame,
      maxLateness: String = "10 minutes",
      classifier: Boolean = false,
      dropDamaged: Boolean = false): DataFrame = {
    val gk = TextAnalysis.gopherKeep(col("text"))
    val pk = TextAnalysis.c4PageKeep(col("text"))
    val base = if (classifier)
      gk && pk && TextAnalysis.classifierKeep(col("text"))
    else gk && pk
    val keep = if (dropDamaged)
      !TextAnalysis.encodingDamaged(col("text")) && base
    else base
    val cleaned = docs
      .filter(keep)
      .withColumn("text", TextAnalysis.c4LineClean(col("text")))
    StreamDedup.dedupWithinWatermark(cleaned, maxLateness)
      .select(col("ingest_ts"), col("doc_id"),
        Redaction.redact(col("text")).as("text"))
  }
}
