package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the standard 4× memory/bandwidth
  * lever for billion-scale vector search: a 64-dim float32 embedding
  * (256 B) becomes 64 int8 codes (64 B), and similarity search runs on
  * integer dot products (SIMD-friendly on every backend; exact
  * integer arithmetic here, which is what makes the whole path
  * ORACLE-ABLE — float cosine scores never hash across engines,
  * integer scores do).
  *
  * Quantizer: fixed power-of-two scale, `q_i = clamp(floor(v_i * 64),
  * -128, 127)`. Deliberately NOT per-vector max-abs scaling:
  *  - the embeddings are ~unit-norm (components well inside ±2), so a
  *    global 2^6 scale loses nothing material;
  *  - multiplying by 2^6 after widening float→double is EXACT (scales
  *    the exponent only), and `floor` of an exact double is exact, so
  *    Spark and any external engine (DuckDB renders the same
  *    `floor(CAST(x AS DOUBLE) * 64)`) produce bit-identical codes —
  *    no round-half ambiguity, no per-vector scale column to carry;
  *  - rank ordering under a shared fixed scale is the same as under
  *    any shared per-dataset scale.
  *
  * Scale shape: quantization is a pure per-row projection (scan →
  * project, no shuffle); quantized search reuses the exact same
  * broadcast/top-k shapes as the float path in [[Similarity]].
  */
object Quantization {

  /** Int8 codes for a float-array column, as an int array (int, not
    * byte, so downstream integer dot products stay in one comfortable
    * type; storage formats would pack to bytes at write time).
    */
  def int8Codes(vec: Column, logScale: Int = 6): Column =
    transform(vec, v =>
      greatest(least(floor(v.cast("double") * (1 << logScale)), lit(127L)),
        lit(-128L)).cast("int"))

  /** Exact integer dot product of two code arrays (BIGINT — 64 dims ×
    * 127² is far inside long range). Native codegen'd kernel; the
    * composed higher-order form below is the semantic reference
    * (bit-parity spec-pinned) — HOFs are CodegenFallback, which is
    * too slow for the all-pairs loops this feeds.
    */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.intDot(a, b)

  /** Composed-built-in reference for [[intDot]] (spec use only). */
  private[graft] def intDotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Corpus-side quantization: (vec_id, qvec, norm2) with the squared
    * L2 norm of the codes (used for cosine-style normalization checks
    * and spec error bounds; integer, hence exact).
    */
  def quantize(corpus: DataFrame, logScale: Int = 6): DataFrame =
    corpus.select(col("vec_id"),
      int8Codes(col("embedding"), logScale).as("qvec"))
      .withColumn("norm2", intDot(col("qvec"), col("qvec")))

  /** Brute-force top-k over quantized codes: same broadcast + window
    * shape as [[Similarity.bruteForceTopK]], but the score is an exact
    * integer dot product — rank AND score replay bit-identically in an
    * external SQL engine. Ties broken by vec_id.
    */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      logScale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = quantize(corpus, logScale)
    val q = queries.select(col("q_id"),
      int8Codes(col("q_vec"), logScale).as("q_codes"))
    val joined = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        intDot(col("q_codes"), col("qvec")).as("qdot"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qdot").desc, col("vec_id").asc)
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("qdot"), col("rk"))
  }
}
