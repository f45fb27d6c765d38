package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Quantization

/** The persisted IVFPQ index: build once from the corpus embeddings,
  * then search bit-identically to the inline ivfPqTopK pipeline — off
  * the index ALONE (the corpus path never appears in the search plan),
  * with the vectors table laid out partitioned by coarse cell.
  */
class RunAnnIndexSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("build → search == inline ivfPqTopK with the same model; " +
      "search never touches the corpus; vectors partitioned by cell") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx-").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    RunAnnIndex.buildIndex(corpus, s"$dir/index")

    // materialize the query set on its own, as a real caller would —
    // the plan assertion below must see ONLY index + query paths
    corpus.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .write.parquet(s"$dir/queries")
    val queries = spark.read.parquet(s"$dir/queries")

    val fromIndex = RunAnnIndex.searchFrame(spark, s"$dir/index",
      queries, topK = 5, nProbe = 2, rerank = 20)
    val got = fromIndex
      .as[(Long, Long, Long, Int)].collect().toSet
    // inline pipeline fed the SAME persisted model artifacts
    val cents = spark.read.parquet(s"$dir/index/centroids")
    val cb = spark.read.parquet(s"$dir/index/codebook")
    val expect = Quantization.ivfPqTopK(corpus, queries, cents,
      topK = 5, nProbe = 2, rerank = 20, codebook = Some(cb))
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expect, s"index search diverged:\n got=$got\n exp=$expect")
    assert(got.nonEmpty && got.groupBy(_._1).size == 5)

    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "a search must never scan the corpus embeddings")
    assert(plan.contains(s"$dir/index"))

    // cell-partitioned layout: one directory per coarse cell
    val cells = new java.io.File(s"$dir/index/vectors").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cells.length > 1, s"expected cell= partitions, got ${cells.toSeq}")
  }

  test("ADC-only search (rerank=0) works off the stored pq codes alone") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx0-").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    RunAnnIndex.buildIndex(corpus, s"$dir/index")
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = RunAnnIndex.searchFrame(spark, s"$dir/index", queries,
      topK = 5, nProbe = 2, rerank = 0)
      .groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 5L), got.toString)
  }
}
