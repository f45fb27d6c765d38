package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted dedup-index lifecycle, end to end on parquet dirs:
  * build once, apply a snapshot against the index alone (the prior
  * corpus is never re-read, let alone re-shingled), and fold survivors
  * back in with `--update` so the NEXT snapshot dedups against them
  * too — the weekly-crawl loop at 100 TB.
  */
class RunDedupIndexSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val longText = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val otherText = (1 to 60).map(i => s"word$i").mkString(" ")

  test("build → apply → update → apply sees the first snapshot") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-").toString
    Seq((1L, longText)).toDF("doc_id", "text")
      .write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")

    // snapshot 1: a re-render of the indexed doc (dropped) + a genuinely
    // new doc (kept); --update folds the survivor into the index
    Seq((10L, longText.toUpperCase), (11L, otherText))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/snap1")
    val kept1 = RunDedupIndex.applyRun(spark, s"$dir/snap1",
      s"$dir/index", s"$dir/out1", thresholdPct = 100, update = true)
    assert(kept1 == 1L)
    assert(spark.read.parquet(s"$dir/out1")
      .select("doc_id").as[Long].collect().toSet == Set(11L))

    // snapshot 2: a re-render of snapshot 1's SURVIVOR — only the
    // updated index can drop it; a fresh doc still passes
    Seq((20L, otherText.toUpperCase),
      (21L, (1 to 60).map(i => s"neu$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/snap2")
    val kept2 = RunDedupIndex.applyRun(spark, s"$dir/snap2",
      s"$dir/index", s"$dir/out2", thresholdPct = 100)
    assert(kept2 == 1L)
    assert(spark.read.parquet(s"$dir/out2")
      .select("doc_id").as[Long].collect().toSet == Set(21L))
  }

  test("apply reads only the index — the corpus is never re-shingled") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-plan-").toString
    Seq((1L, longText)).toDF("doc_id", "text")
      .write.parquet(s"$dir/prior_corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/prior_corpus"),
      s"$dir/index")
    val frame = RunDedupIndex.applyFrame(spark,
      Seq((2L, otherText)).toDF("doc_id", "text"), s"$dir/index",
      thresholdPct = 100)
    assert(frame.select("doc_id").as[Long].collect().toSet == Set(2L))
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("prior_corpus"),
      "an apply run must never scan the corpus behind the index")
    assert(plan.contains("band_index") && plan.contains("shingle_index"))
  }

  test("apply plan touches the band index ONLY through the candidate " +
      "join: no Window, no index-wide aggregate, blocklist read " +
      "precomputed") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-hot-").toString
    Seq((1L, longText)).toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")
    assert(new java.io.File(s"$dir/index/hot_buckets").isDirectory,
      "build must persist the hot-bucket blocklist")
    val frame = RunDedupIndex.applyFrame(spark,
      Seq((2L, otherText)).toDF("doc_id", "text"), s"$dir/index",
      thresholdPct = 100)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Window => LWindow}
    val lp = frame.queryExecution.optimizedPlan
    assert(lp.collect { case w: LWindow => w }.isEmpty,
      "an apply run must never window the persisted index")
    // every aggregate whose subtree reads band_index must sit ABOVE the
    // candidate equi-join (i.e. on already-collapsed candidate rows) —
    // the pre-r15 plan put a bucket-count aggregate/window directly on
    // the index scan, a full index shuffle per weekly snapshot
    val offending = lp.collect {
      case a: Aggregate if a.toString.contains("band_index") &&
        a.collectFirst { case j: Join => j }.isEmpty => a
    }
    assert(offending.isEmpty,
      s"index-wide aggregate in the apply plan:\n${offending.mkString}")
    val phys = frame.queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), "no Window in the physical plan")
    assert(phys.contains("hot_buckets"),
      "the blocklist must come from the persisted hot_buckets table")
  }

  test("a crash between survivor write and index append re-runs " +
      "idempotently") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-crash-").toString
    Seq((1L, longText)).toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")
    Seq((10L, otherText)).toDF("doc_id", "text")
      .write.parquet(s"$dir/snap")
    // run 1 "crashed" after the survivor write, before the append
    RunDedupIndex.applyRun(spark, s"$dir/snap", s"$dir/index",
      s"$dir/out", thresholdPct = 100, update = false)
    // the repair re-run appends; a THIRD run must then drop the doc
    // (it is now indexed) and leave exactly one index copy behind
    RunDedupIndex.applyRun(spark, s"$dir/snap", s"$dir/index",
      s"$dir/out", thresholdPct = 100, update = true)
    val idx = spark.read.parquet(s"$dir/index/shingle_index")
    assert(idx.filter(col("doc_id") === 10L).count() == 1L)
    val kept3 = RunDedupIndex.applyRun(spark, s"$dir/snap", s"$dir/index",
      s"$dir/out3", thresholdPct = 100)
    assert(kept3 == 0L)
  }

  test("re-running a successful --update apply keeps the output " +
      "instead of recomputing against the folded survivors") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-retry-").toString
    Seq((1L, longText)).toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")
    Seq((10L, otherText)).toDF("doc_id", "text")
      .write.parquet(s"$dir/snap")
    val kept1 = RunDedupIndex.applyRun(spark, s"$dir/snap", s"$dir/index",
      s"$dir/out", thresholdPct = 100, update = true)
    assert(kept1 == 1L)
    // orchestrator retry: without the marker this would recompute
    // against an index that now CONTAINS doc 10 and overwrite out with
    // zero rows — the marker must short-circuit to the existing output
    val kept2 = RunDedupIndex.applyRun(spark, s"$dir/snap", s"$dir/index",
      s"$dir/out", thresholdPct = 100, update = true)
    assert(kept2 == 1L)
    assert(spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet == Set(10L))
    // and the index did not double-append
    assert(spark.read.parquet(s"$dir/index/shingle_index")
      .filter(col("doc_id") === 10L).count() == 1L)
  }

  test("compact self-heals a crash between its two renames") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-heal-").toString
    Seq((1L, longText)).toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")
    // simulate the torn state: live renamed to .old, replacement never
    // arrived — the live table name is missing entirely
    val live = new java.io.File(s"$dir/index/band_index")
    val old = new java.io.File(s"$dir/index/band_index.old")
    assert(live.renameTo(old) && !live.exists())
    RunDedupIndex.compactIndex(spark, s"$dir/index", numFiles = 1)
    assert(live.isDirectory && !old.exists())
    val probe = Seq((900L, longText.toUpperCase)).toDF("doc_id", "text")
    assert(RunDedupIndex.applyFrame(spark, probe, s"$dir/index",
      thresholdPct = 100).count() == 0L,
      "the healed index must still drop the re-render")
  }

  test("compact shrinks the appended index to numFiles and changes " +
      "no verdict") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedupidx-cpt-").toString
    Seq((1L, longText)).toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    RunDedupIndex.buildIndex(spark.read.parquet(s"$dir/corpus"),
      s"$dir/index")
    // five weekly updates, each appending files
    (0 until 5).foreach { w =>
      Seq((100L + w, (1 to 60).map(i => s"w${w}t$i").mkString(" ")))
        .toDF("doc_id", "text").write.parquet(s"$dir/snap$w")
      RunDedupIndex.applyRun(spark, s"$dir/snap$w", s"$dir/index",
        s"$dir/out$w", thresholdPct = 100, update = true)
    }
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    val before = parquetFiles(s"$dir/index/band_index")
    assert(before > 2, s"appends must have fragmented the index: $before")
    val probe = Seq((900L, longText.toUpperCase), (901L, otherText))
      .toDF("doc_id", "text")
    val verdictBefore = RunDedupIndex.applyFrame(spark, probe,
      s"$dir/index", thresholdPct = 100)
      .select("doc_id").as[Long].collect().toSet
    RunDedupIndex.compactIndex(spark, s"$dir/index", numFiles = 2)
    assert(parquetFiles(s"$dir/index/band_index") == 2)
    assert(parquetFiles(s"$dir/index/shingle_index") == 2)
    val verdictAfter = RunDedupIndex.applyFrame(spark, probe,
      s"$dir/index", thresholdPct = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(verdictAfter == verdictBefore && verdictBefore == Set(901L))
    // idempotent: compacting a compacted index is a no-op in content
    RunDedupIndex.compactIndex(spark, s"$dir/index", numFiles = 2)
    assert(RunDedupIndex.applyFrame(spark, probe, s"$dir/index",
      thresholdPct = 100).select("doc_id").as[Long].collect().toSet ==
      Set(901L))
  }
}
