package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with the decode /
  * feature-extraction boundary isolated behind one deterministic stub.
  *
  * The Spark-side plumbing is the real deliverable and is fully
  * exercised: schema (binary + struct), partition-parallel batch decode
  * (`mapPartitions`-free — a vectorizable UDF over the payload), byte
  * level ops as pure built-ins, and frame-sampling as `sequence` +
  * `explode`. The actual codec call (`ImageIO.read`, ffmpeg, …) is not
  * available in this environment, so [[fakeDecodeFeatures]] computes a
  * deterministic byte-histogram "embedding" with the exact signature a
  * real decoder UDF would have (`Array[Byte] => Array[Float]`); swap
  * the body, keep the plan.
  *
  * At 100 TB: payloads dominate I/O, so every operator here projects
  * the binary column once, derives small fixed-width outputs, and never
  * shuffles payload bytes — group/join keys are ids and hashes only.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(
      kind: String,
      width: Int,
      height: Int,
      durationMs: Long)

  /** Attach a synthetic payload + metadata to a documents frame —
    * the test stand-in for reading real media files
    * (`spark.read.format("binaryFile")` in production).
    */
  def withFakePayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("kind"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        (length(col("text")) * 10L).as("durationMs")).as("meta"))

  /** Byte-level description of a payload — all built-ins, no decode:
    * (id, n_bytes, sha256 hex, first-8-bytes hex header). This is the
    * dedup/integrity pass you run before any expensive decode.
    */
  def describeBinary(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("sha256"),
      lower(hex(substring(col(binCol), 1, 8))).as("header_hex"))

  /** The decode stub: a deterministic 16-bin byte histogram, L1
    * normalized — stands in for "decode image → pooled feature vector".
    * Signature and batch shape match a real decoder (one payload in,
    * one fixed-width Float vector out); runs partition-parallel with no
    * driver involvement.
    */
  // One decoder handle per executor JVM — the scalar path must not pay
  // (real-codec-grade) session construction per ROW; lazy so the
  // closure serializes the module reference, not the session.
  @transient private lazy val sharedSession = new FakeDecoderSession

  val fakeDecodeFeatures = udf { bytes: Array[Byte] =>
    // delegate to the one stub implementation so the scalar and
    // batched paths can never diverge
    sharedSession.decode(bytes)
  }

  /** Decode + featurize: (id, features[16]). The UDF is the single
    * non-codegen island; everything around it stays whole-stage.
    */
  def featurize(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol), fakeDecodeFeatures(col(binCol)).as("features"))

  /** Frame-sampling plan for video-like payloads: given `durationMs` in
    * the meta struct and a sampling interval, emit one row per sampled
    * frame timestamp. Pure `sequence` + `explode` — the Spark-native
    * expansion a real frame extractor plugs into.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.select(
      col("doc_id"),
      explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs)))
        .as("frame_ts_ms"))

  /** Resize stub: produce a payload for the target geometry and update
    * the typed metadata in one projection. The byte transform is a
    * deterministic fake (truncate/cycle to `w*h` bytes — a real codec
    * binding would decode, scale, re-encode); the Spark-side contract
    * is the real thing: payload and meta stay consistent, the struct is
    * rebuilt immutably, and the operation is a pure per-row map (no
    * shuffle — resizes parallelize with the scan).
    */
  def resizeStub(df: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize target ${w}x$h out of range")
    val target = w.toLong * h
    val fakeResize = udf { bytes: Array[Byte] =>
      if (bytes == null || bytes.isEmpty) new Array[Byte](target.toInt)
      else Array.tabulate(target.toInt)(i => bytes(i % bytes.length))
    }
    df.withColumn("payload", fakeResize(col("payload")))
      .withColumn("meta", struct(
        col("meta.kind").as("kind"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.durationMs").as("durationMs")))
  }

  /** Partition-batched decode — the Scala analog of a Pandas UDF over
    * `mapInPandas`: the expensive decoder context (codec handle, model
    * weights, GPU session) is initialized ONCE PER PARTITION and reused
    * across that partition's rows, instead of per row. That
    * amortization is the entire point of batch-shaped decode UDFs at
    * 100 TB; the per-row scalar UDF ([[fakeDecodeFeatures]]) cannot
    * express it.
    *
    * The "decoder" here is the deterministic stub; swap
    * `FakeDecoderSession` for a real codec binding, keep the plan.
    */
  def featurizeBatched(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val session = new FakeDecoderSession // once per partition
        rows.map { case (id, bytes) => (id, session.decode(bytes)) }
      }
      .toDF(idCol, "features")
  }

  /** Stands in for a heavyweight decoder handle (ffmpeg context, JNI
    * codec, ONNX session). Construction is the expensive step a real
    * implementation amortizes per partition.
    */
  final class FakeDecoderSession {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](16)
      if (bytes != null && bytes.nonEmpty) {
        bytes.foreach(b => bins((b & 0xFF) >> 4) += 1.0f)
        val n = bytes.length.toFloat
        var i = 0
        while (i < 16) { bins(i) /= n; i += 1 }
      }
      bins
    }
  }
}
