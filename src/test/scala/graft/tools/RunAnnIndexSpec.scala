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

  test("update appends under the frozen model: post-append search == " +
      "fresh encode of the union, and == inline ivfPqSearchIndex") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx-upd-").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val firstBatch = all.filter(col("vec_id") < 300)
    val newBatch = all.filter(col("vec_id") >= 300)
    newBatch.write.parquet(s"$dir/new_batch")

    RunAnnIndex.buildIndex(firstBatch, s"$dir/index")
    RunAnnIndex.updateIndex(spark, s"$dir/index", s"$dir/new_batch")

    val queries = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = RunAnnIndex.searchFrame(spark, s"$dir/index", queries,
      topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet

    // the same persisted model over the UNION, encoded fresh — the
    // append must be indistinguishable from having built with the
    // full corpus under these centroids/codebook
    val cents = spark.read.parquet(s"$dir/index/centroids")
    val cb = spark.read.parquet(s"$dir/index/codebook")
    val freshRows = Quantization.ivfPqIndexRows(
      firstBatch.union(spark.read.parquet(s"$dir/new_batch")), cents, cb)
    val expect = Quantization.ivfPqSearchIndex(freshRows, cents, cb,
      queries, topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expect, s"post-append search diverged:\n got=$got\n exp=$expect")

    // the appended half is actually searchable: a query with the exact
    // embedding of an APPENDED vector (fresh q_id, so the self-id
    // filter doesn't hide it) must surface that vector at rank 1
    val self = all.filter(col("vec_id") === 400)
      .select(lit(999999L).as("q_id"), col("embedding").as("q_vec"))
    val top = RunAnnIndex.searchFrame(spark, s"$dir/index", self,
      topK = 1, nProbe = 2, rerank = 20)
      .select("vec_id").as[Long].collect()
    assert(top.headOption.contains(400L), s"got $top")
  }

  test("compact shrinks the appended vectors table per cell and " +
      "changes no result") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx-cpt-").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    RunAnnIndex.buildIndex(all.filter(col("vec_id") < 200), s"$dir/index")
    (0 until 3).foreach { b =>
      val lo = 200 + b * 100
      all.filter(col("vec_id") >= lo && col("vec_id") < lo + 100)
        .write.parquet(s"$dir/batch$b")
      RunAnnIndex.updateIndex(spark, s"$dir/index", s"$dir/batch$b")
    }
    def filesPerCell: Map[String, Int] =
      new java.io.File(s"$dir/index/vectors").listFiles()
        .filter(_.getName.startsWith("cell=")).map(d =>
          d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = filesPerCell
    assert(before.values.max > 2,
      s"appends must have fragmented some cell: $before")
    val queries = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val resBefore = RunAnnIndex.searchFrame(spark, s"$dir/index", queries,
      topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet
    RunAnnIndex.compactIndex(spark, s"$dir/index", numFiles = 2)
    val after = filesPerCell
    assert(after.values.max <= 2, s"compact left fragments: $after")
    val resAfter = RunAnnIndex.searchFrame(spark, s"$dir/index", queries,
      topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(resAfter == resBefore)
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

  test("merge of two same-model snapshots == the single-tree result; " +
      "overlap dedupes; a cross-model merge refuses") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-annidx-mrg-").toString
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    // snapshot A: built (trains the model); snapshot B: the second
    // crawl, encoded against A's FROZEN artifacts — the central-model
    // / many-encoders pattern merge exists for. The two slices
    // deliberately OVERLAP on [280, 300) to exercise the exact-dup
    // collapse.
    RunAnnIndex.buildIndex(all.filter(col("vec_id") < 300), s"$dir/a")
    val cents = spark.read.parquet(s"$dir/a/centroids")
    val cb = spark.read.parquet(s"$dir/a/codebook")
    cents.write.parquet(s"$dir/b/centroids")
    cb.write.parquet(s"$dir/b/codebook")
    Quantization.ivfPqIndexRows(
        all.filter(col("vec_id") >= 280), cents, cb)
      .write.partitionBy("cell").parquet(s"$dir/b/vectors")

    RunAnnIndex.mergeIndexes(spark, s"$dir/a", s"$dir/b", s"$dir/m")

    // row accounting: union minus the 20-vector overlap, once each
    val total = all.count()
    val mergedRows = spark.read.parquet(s"$dir/m/vectors").count()
    assert(mergedRows == total, s"expected $total rows, got $mergedRows")
    val dupIds = spark.read.parquet(s"$dir/m/vectors")
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(dupIds == 0, s"$dupIds vec_ids duplicated after merge")

    // search parity: the merged tree answers exactly like one tree
    // holding the full corpus under the same model
    val queries = all.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val got = RunAnnIndex.searchFrame(spark, s"$dir/m", queries,
      topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet
    val expect = Quantization.ivfPqSearchIndex(
      Quantization.ivfPqIndexRows(all, cents, cb), cents, cb,
      queries, topK = 5, nProbe = 2, rerank = 20)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == expect, s"merged search diverged:\n got=$got\n exp=$expect")

    // a snapshot trained independently carries a DIFFERENT model —
    // its codes share no space with A's, and the merge must refuse
    // rather than mint a corrupt tree
    RunAnnIndex.buildIndex(all.filter(col("vec_id") >= 300), s"$dir/c")
    val err = intercept[IllegalArgumentException] {
      RunAnnIndex.mergeIndexes(spark, s"$dir/a", s"$dir/c", s"$dir/x")
    }
    assert(err.getMessage.contains("frozen-model mismatch"),
      err.getMessage)
    assert(!new java.io.File(s"$dir/x/vectors").exists(),
      "a refused merge must not write a partial tree")
  }

  test("REGRESSION (r17 flake): eight consecutive build → read-back " +
      "cycles in one session see a dense codebook every time") {
    // the one observed flake was a just-written codebook reading back
    // EMPTY once in a ~3300-stage shared session (surfacing as 'PQ
    // codebook must be dense 8x16; got 0' three operators later).
    // buildIndex now refreshes the path cache and gates the read-back
    // count at the write site (RunAnnIndex.readBack); this loop
    // hammers exactly that write→read-back edge so any recurrence
    // fails HERE, loudly, instead of flaking a distant search
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    (1 to 8).foreach { i =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-annidx-rg$i-").toString
      RunAnnIndex.buildIndex(corpus, s"$dir/index")
      val cb = spark.read.parquet(s"$dir/index/codebook")
      assert(cb.count() == 128L, s"cycle $i: codebook not dense")
      assert(spark.read.parquet(s"$dir/index/centroids").count() == 8L,
        s"cycle $i: centroids not k")
    }
  }
}
