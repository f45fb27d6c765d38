package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion sources for the training-data pipeline side of the
  * engine — the formats large text/multimodal corpora actually arrive
  * in, each mapped to the matching Spark scan so pushdown/pruning work:
  *
  *  - JSONL (one document per line) — the lingua franca of LLM corpus
  *    distribution. Explicit schema (NEVER inference at 100 TB: schema
  *    inference is a full extra pass over the data), PERMISSIVE mode
  *    with a corrupt-record column so one bad line doesn't kill a
  *    thousand-file read, and a salvage filter that quarantines rather
  *    than drops.
  *  - binaryFile — opaque media payloads (image/audio/video) with file
  *    metadata, feeding [[graft.ops.Multimodal]]. `pathGlobFilter`
  *    prunes at listing time, before any bytes are read.
  *  - Parquet — the engine's native interchange (see TESTDATA.md).
  */
object CorpusSources {

  /** The documents schema (matches testdata's documents.parquet). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"

  /** Read a JSONL corpus. Returns (good, quarantined): rows that parsed
    * against the schema, and raw lines that didn't (kept with their
    * original text for triage — silently dropping corrupt data at
    * corpus scale is how datasets rot).
    */
  def readJsonl(
      spark: SparkSession,
      path: String): (DataFrame, DataFrame) = {
    val all = spark.read
      .schema(DocumentSchema.add(StructField(Corrupt, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      // PERMISSIVE corrupt-record semantics require materializing the
      // frame's corrupt column before filtering on it
      .cache()
    val good = all.filter(col(Corrupt).isNull).drop(Corrupt)
    val bad = all.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    (good, bad)
  }

  /** Read a directory tree of media files as (path, length, content)
    * binary rows — the ingest edge for [[graft.ops.Multimodal]].
    * Listing-time glob pruning; no decode happens here.
    */
  def readBinaryFiles(
      spark: SparkSession,
      path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        col("path"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
}
