package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Int8 quantization: exactness of the codes (the property the oracle
  * relies on) and retrieval quality of integer-dot search vs the float
  * cosine baseline on the real sf0.001 embeddings.
  */
class QuantizationSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("int8 codes are exact floor(v * 64) with clamping") {
    val df = Seq((1L, Seq(0.5f, -0.5f, 1.99f, -1.99f, 3.0f, -3.0f, 0.0f,
      0.015625f))).toDF("vec_id", "embedding")
    val codes = df.select(Quantization.int8Codes(col("embedding")))
      .as[Seq[Int]].head()
    // 0.5*64=32; -0.5*64=-32; 1.99f*64 = 127.36 -> 127; -1.99f*64 ->
    // floor(-127.36) = -128; 3.0*64=192 -> clamp 127; -192 -> clamp
    // -128; 0 -> 0; 2^-6*64 = 1
    assert(codes == Seq(32, -32, 127, -128, 127, -128, 0, 1))
  }

  test("integer dot is the exact sum of code products") {
    val df = Seq((1L, Seq(1.0f, -1.0f), Seq(0.5f, 0.25f)))
      .toDF("id", "a", "b")
    val dot = df.select(Quantization.intDot(
      Quantization.int8Codes(col("a")), Quantization.int8Codes(col("b"))))
      .as[Long].head()
    // codes: [64, -64] · [32, 16] = 2048 - 1024 = 1024
    assert(dot == 1024L)
  }

  test("native intDot == composed HOF reference on real embeddings") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(Quantization.int8Codes(col("embedding")).as("q"))
    val bad = corpus
      .select(Quantization.intDot(col("q"), col("q")).as("native"),
        Quantization.intDotComposed(col("q"), col("q")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(bad == 0L)
  }

  test("intDot rejects length mismatch and null elements loudly") {
    val mismatch = intercept[Exception] {
      Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
        .select(graft.functions.VectorExprs.intDot(col("a"), col("b")))
        .head()
    }
    def deepMsg(t: Throwable): String =
      Option(t.getCause).fold(t.getMessage)(c => t.getMessage + " | " + deepMsg(c))
    assert(deepMsg(mismatch).contains("length mismatch"))
    val nul = intercept[Exception] {
      spark.range(1)
        .selectExpr("array(1, cast(null as int)) as a", "array(1, 2) as b")
        .select(graft.functions.VectorExprs.intDot(col("a"), col("b")))
        .head()
    }
    assert(deepMsg(nul).contains("array_compact"))
  }

  test("quantized top-k recall vs float cosine baseline is high") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topkMap(Similarity.bruteForceTopK(corpus, queries, k = 10))
    val quant = topkMap(Quantization.quantizedTopK(corpus, queries, k = 10))
    val per = exact.map { case (q, truth) =>
      quant.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val recall = per.sum / per.size
    // int8 at scale 2^6 on ~unit vectors: quantization noise is small
    // relative to neighbor gaps — the top-10 sets mostly survive.
    // (Integer dot ranks by unnormalized similarity; the embeddings
    // are near-constant norm, so the ordering transfers.)
    assert(recall > 0.7, s"quantized recall too low: $recall")
  }
}
