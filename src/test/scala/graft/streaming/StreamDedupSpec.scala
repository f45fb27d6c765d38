package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming exact dedup: bounded-state within-watermark dedup and the
  * stream-static anti-join against an ingested-corpus snapshot.
  */
class StreamDedupSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  case class Doc(ingest_ts: Timestamp, doc_id: Long, text: String)

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("dropDuplicatesWithinWatermark keeps one copy of a re-sent doc") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamDedup.dedupWithinWatermark(
      input.toDF(), maxLateness = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("sd_watermark")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sd-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 1L, "alpha beta"),
        Doc(ts(2), 2L, "  Alpha   BETA "), // same normalized content
        Doc(ts(3), 3L, "gamma"))
      q.processAllAvailable()
      // a later micro-batch re-sends the same content within the horizon
      input.addData(Doc(ts(5), 4L, "alpha beta"))
      q.processAllAvailable()
      val kept = spark.table("sd_watermark")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L),
        s"one copy per content within the watermark, got $kept")
    } finally q.stop()
  }

  test("stream-static anti-join drops docs already in the corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(5L -> "seen before").toDF("doc_id", "text")
      .select(md5(graft.ops.TextDedup.normText(col("text")))
        .as("text_hash"))
    val input = MemoryStream[Doc]
    val out = StreamDedup.dedupAgainstCorpus(input.toDF(), corpus)
    val q = out.writeStream
      .format("memory").queryName("sd_corpus")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdc-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 10L, "SEEN  before"), // dup of the corpus row
        Doc(ts(2), 11L, "brand new"))
      q.processAllAvailable()
      val kept = spark.table("sd_corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(11L), s"corpus dup must be dropped, got $kept")
    } finally q.stop()
  }

  test("stream Bloom keys derive from the batch band-bucket key") {
    // The ingest gate and the batch LSH bucketing must agree on what a
    // "bucket" is, or batch-vs-stream dedup silently diverge: the gate
    // inserts/probes xxhash64(band_idx, band_hash) while
    // minHashCandidates joins on (band_idx, band_hash). Pin that the
    // key multiset the stream side derives (per-row fused band array,
    // element_at probe expression — the exact expressions
    // nearDedupAgainstCorpus builds) equals xxhash64 over the batch
    // band frame, so neither side can drift to a different band count,
    // seed set, or index base without failing here.
    val docs = Seq(
      1L -> (0 until 40).map(i => s"w$i").mkString(" "),
      2L -> "short text",
      3L -> (0 until 40).map(i => s"v$i").mkString(" "))
      .toDF("doc_id", "text")
    val batchKeys = graft.ops.TextDedup.minHashBands(docs)
      .select(xxhash64(col("band_idx"), col("band_hash")).as("h"))
      .as[Long].collect().sorted.toSeq
    val bands = graft.functions.MinHashExprs.minHashBands(
      graft.ops.TextDedup.shingles(col("text"), 3), 32, 4)
    val probeKeys = docs.withColumn("__bands", bands)
      .select(explode(transform(sequence(lit(1), lit(8)),
        i => xxhash64(i - 1, element_at(col("__bands"), i)))).as("h"))
      .as[Long].collect().sorted.toSeq
    assert(batchKeys == probeKeys)
  }

  test("Bloom gate never misses a batch candidate pair (no false negatives)") {
    // Every stream doc the BATCH pipeline would pair with a corpus doc
    // must be dropped by the gate (the gate may over-drop — Bloom false
    // positives — but a false NEGATIVE would let a near-dup through at
    // ingest that the batch dedup then has to catch later).
    val corpusDocs = (0L until 5L).map { d =>
      d -> (0 until 50).map(i => s"c${d}t$i").mkString(" ")
    }
    val streamDocs = Seq(
      100L -> corpusDocs(1)._2.replace("c1t25", "MUT"), // near-dup of 1
      101L -> corpusDocs(3)._2,                         // exact dup of 3
      102L -> (0 until 50).map(i => s"fresh$i").mkString(" "))
    val corpus = corpusDocs.toDF("doc_id", "text")
    val stream = streamDocs.toDF("doc_id", "text")
    val cands = graft.ops.TextDedup
      .minHashCandidates(corpus.unionByName(stream), maxBucket = 10000)
      .filter(col("doc_a") < 100L && col("doc_b") >= 100L)
      .select("doc_b").as[Long].collect().toSet
    assert(cands.nonEmpty, "fixture must produce cross candidates")
    val kept = StreamDedup.nearDedupAgainstCorpus(stream, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert((kept & cands).isEmpty,
      s"batch candidates ${cands & kept} survived the stream gate")
  }

  test("stream-static Bloom gate drops NEAR-dups of corpus docs") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    // near-dup: one token of sixty changed — shares almost all
    // 3-shingles with base, so some of the 8 MinHash bands collide
    val near = (0 until 60).map(i => if (i == 30) "MUT" else s"tok$i")
      .mkString(" ")
    val unrelated = (0 until 60).map(i => s"other$i").mkString(" ")
    val corpus = Seq(1L -> base).toDF("doc_id", "text")
    val input = MemoryStream[Doc]
    val out = StreamDedup.nearDedupAgainstCorpus(input.toDF(), corpus)
    val q = out.writeStream
      .format("memory").queryName("sd_near")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdn-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 20L, near),      // near-dup of corpus doc 1 -> drop
        Doc(ts(2), 21L, base),      // exact dup -> drop (all bands match)
        Doc(ts(3), 22L, unrelated)) // no shared shingles -> keep
      q.processAllAvailable()
      val kept = spark.table("sd_near")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(22L), s"near-dups must be dropped, got $kept")
    } finally q.stop()
  }

  test("gopher quality gate runs unchanged on a stream (stateless per-row)") {
    // gopherQualityFilter is a pure projection + filter — no
    // aggregation, no state — so the SAME operator body is legal in a
    // streaming query with no watermark or output-mode ceremony. Pin
    // that batch/stream parity here (the batch side of this fixture is
    // covered by TextOpsSpec's boundary test).
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = graft.ops.TextAnalysis.gopherQualityFilter(
      input.toDF().select(col("doc_id"), col("text")))
    val q = out.writeStream
      .format("memory").queryName("sd_gopher")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdg-").toString)
      .start()
    try {
      val passing =
        (Seq("the", "with") ++ Seq.fill(48)("word")).mkString(" ")
      input.addData(
        Doc(ts(1), 30L, passing),           // passes every rule
        Doc(ts(2), 31L, "too short"),       // fails the word-count floor
        Doc(ts(3), 32L, passing.replace("the", "aaa"))) // one stop word
      q.processAllAvailable()
      val verdicts = spark.table("sd_gopher")
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
      assert(verdicts == Map(30L -> true, 31L -> false, 32L -> false))
    } finally q.stop()
  }

  test("C4 page gate runs unchanged on a stream (stateless per-row)") {
    // c4PageFilter is projection + filter, no state — the same operator
    // body is legal in a streaming query as-is.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = graft.ops.TextAnalysis.c4PageFilter(
      input.toDF().select(col("doc_id"), col("text")))
    val q = out.writeStream
      .format("memory").queryName("sd_c4page")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdp-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 40L, "one fine line. two more here. three to close."),
        Doc(ts(2), 41L, "lorem ipsum filler. two. three."), // placeholder
        Doc(ts(3), 42L, "code { x }. two. three."),         // code brace
        Doc(ts(4), 43L, "just one."))                       // < 3 sentences
      q.processAllAvailable()
      val verdicts = spark.table("sd_c4page")
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
      assert(verdicts ==
        Map(40L -> true, 41L -> false, 42L -> false, 43L -> false))
    } finally q.stop()
  }

  test("C4 line cleaning runs unchanged on a stream (per-row form)") {
    // c4LineClean is the zero-exchange projection form of the line
    // rules (c4LineFilter's clean_text without the explode/groupBy
    // reassembly), so it streams with no output-mode ceremony —
    // the form a streaming curation pipeline would use.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = input.toDF().select(col("doc_id"),
      graft.ops.TextAnalysis.c4LineClean(col("text")).as("clean_text"))
    val q = out.writeStream
      .format("memory").queryName("sd_c4line")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdl-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 50L,
          "a good first line right here.\nshort one\n" +
            "enable javascript to view this page.\n" +
            "another keeper line ends well!"))
      q.processAllAvailable()
      val cleaned = spark.table("sd_c4line")
        .select("clean_text").as[String].collect().head
      assert(cleaned ==
        "a good first line right here.\nanother keeper line ends well!")
    } finally q.stop()
  }

  test("linear quality classifier runs unchanged on a stream") {
    // classifierScore is a per-row projection (the model is integer
    // literals folded into codegen), so the ingest-time quality gate
    // is the same operator body as the batch one.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = graft.ops.TextAnalysis.classifierScore(
      input.toDF().select(col("doc_id"), col("text")))
    val q = out.writeStream
      .format("memory").queryName("sd_classifier")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdq-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 70L, "the cat and the dog ran to the park with care."),
        Doc(ts(2), 71L, "12345 67890 !!! ??? 555 000 111 222"))
      q.processAllAvailable()
      val verdicts = spark.table("sd_classifier")
        .select("doc_id", "keep").as[(Long, Int)].collect().toMap
      assert(verdicts == Map(70L -> 1, 71L -> 0))
    } finally q.stop()
  }

  test("curateStream: gates, cleaning, dedup and redaction on a stream") {
    // the full ingest-time pipeline: only the dedup holds state
    implicit val sqlCtx = spark.sqlContext
    val prose = (1 to 60)
      .map(i => s"the data and model run $i goes to the set with care.")
      .mkString("\n")
    val input = MemoryStream[Doc]
    val out = StreamCuration.curateStream(input.toDF())
    val q = out.writeStream
      .format("memory").queryName("sd_curate")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdcu-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 80L, prose), // survives
        Doc(ts(2), 81L, "too short"), // gopher drops
        Doc(ts(3), 82L, prose + "\nlorem ipsum dolor sit amet."), // page
        Doc(ts(4), 83L, prose + "\ncall +6281234567 now please today."))
      q.processAllAvailable()
      // a later batch re-sends doc 80's content — within-watermark
      // dedup must drop it
      input.addData(Doc(ts(5), 84L, prose))
      q.processAllAvailable()
      val rows = spark.table("sd_curate")
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(rows.keySet == Set(80L, 83L), s"kept ${rows.keySet}")
      assert(rows(83L).contains("<PHONE>") && !rows(83L).contains("+62812"))
    } finally q.stop()
  }

  test("curateStream dropDamaged: a mojibake doc that passes every " +
      "quality gate dies at the encoding gate; off by default") {
    implicit val sqlCtx = spark.sqlContext
    val prose = (1 to 60)
      .map(i => s"the data and model run $i goes to the set with care.")
      .mkString("\n")
    // passes gopher + c4 (long, stopwords, terminal periods) but
    // carries the UTF-8-as-Latin-1 telltale
    val damaged = prose + "\nthe caffÃ¨ story ends here."
    for ((flag, expect) <- Seq(
        (true, Set(90L)), (false, Set(90L, 91L)))) {
      val input = MemoryStream[Doc]
      val out = StreamCuration.curateStream(input.toDF(),
        dropDamaged = flag)
      val name = s"sd_damaged_$flag"
      val q = out.writeStream
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sddm-").toString)
        .start()
      try {
        input.addData(Doc(ts(1), 90L, prose), Doc(ts(2), 91L, damaged))
        q.processAllAvailable()
        val kept = spark.table(name)
          .select("doc_id").as[Long].collect().toSet
        assert(kept == expect, s"dropDamaged=$flag kept $kept")
      } finally q.stop()
    }
  }

  test("within-doc line dedup runs unchanged on a stream (pure projection)") {
    // lineDedupWithinDoc has no corpus-wide stage at all, so the same
    // operator body streams as a stateless projection.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = graft.ops.TextDedup.lineDedupWithinDoc(
      input.toDF().select(col("doc_id"), col("text")))
    val q = out.writeStream
      .format("memory").queryName("sd_withindoc")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdw-").toString)
      .start()
    try {
      input.addData(Doc(ts(1), 60L, "nav\nbody text.\nnav\nfooter"))
      q.processAllAvailable()
      val row = spark.table("sd_withindoc")
        .select("n_lines", "kept_lines", "dedup_text")
        .as[(Long, Long, String)].collect().head
      assert(row == ((4L, 3L, "nav\nbody text.\nfooter")))
    } finally q.stop()
  }

  test("index-fed Bloom gate == corpus-fed gate, off the PERSISTED " +
      "parquet band index") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val near = (0 until 60).map(i => if (i == 30) "MUT" else s"tok$i")
      .mkString(" ")
    val unrelated = (0 until 60).map(i => s"other$i").mkString(" ")
    val corpus = Seq(1L -> base).toDF("doc_id", "text")
    // the weekly batch job persists the index once; the ingest stream
    // gates against the index parquet — corpus text never re-shingles
    val dir = Files.createTempDirectory("graft-sdidx-").toString
    graft.tools.RunDedupIndex.buildIndex(corpus, s"$dir/index")
    val bandIndex = spark.read.parquet(s"$dir/index/band_index")
    val input = MemoryStream[Doc]
    val out = StreamDedup.nearDedupAgainstIndex(input.toDF(), bandIndex)
    val q = out.writeStream
      .format("memory").queryName("sd_near_idx")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdni-").toString)
      .start()
    try {
      input.addData(
        Doc(ts(1), 20L, near),      // near-dup of the indexed doc -> drop
        Doc(ts(2), 21L, base),      // exact dup -> drop
        Doc(ts(3), 22L, unrelated)) // fresh -> keep
      q.processAllAvailable()
      val kept = spark.table("sd_near_idx")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(22L), s"index gate must match corpus gate: $kept")
    } finally q.stop()
    // batch-mode parity: same verdicts as the corpus-fed gate
    val streamDocs = Seq(20L -> near, 21L -> base, 22L -> unrelated)
      .toDF("doc_id", "text")
    val viaIndex = StreamDedup.nearDedupAgainstIndex(streamDocs, bandIndex)
      .select("doc_id").as[Long].collect().toSet
    val viaCorpus = StreamDedup.nearDedupAgainstCorpus(streamDocs, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == viaCorpus)
  }

  test("STREAM verdicts == batch incrementalNearNew verdicts against " +
      "the SAME persisted index snapshot (real sf0.001 corpus)") {
    // the full batch/stream index-lifecycle loop (VERDICT r17 stretch):
    // the weekly batch job builds RunDedupIndex once; the ingest
    // stream gates against the index's band blocklist, and a doc the
    // stream KEEPS must be exactly a doc the batch incremental
    // near-dup pass surfaces no candidate for. (The stream side may
    // additionally drop Bloom false positives by design; at this
    // corpus size vs expectedItems=1M the measured FP count is zero,
    // so the sets compare EQUAL — if the driver ever regenerates
    // testdata and a Bloom FP appears, weaken only the kept-side
    // inclusion, never the no-false-negative direction.)
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft-sdidx2-").toString
    graft.tools.RunDedupIndex.buildIndex(corpus, s"$dir/index")
    val bandIndex = spark.read.parquet(s"$dir/index/band_index")

    // the new snapshot: mutated near-dups of every 13th corpus doc
    // (the planted-recall convention's mutation) + genuinely fresh docs
    val mutated = corpus.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"),
        regexp_replace(graft.ops.TextDedup.normText(col("text")),
          "((?:\\S+ ){49})\\S+", "$1zzplantzz").as("text"))
    val fresh = spark.range(9000L, 9040L)
      .select(col("id").as("doc_id"),
        concat(lit("completely novel content block "),
          col("id").cast("string"), lit(" with unique tokens "),
          (col("id") * 31).cast("string"), lit(" "),
          (col("id") * 57).cast("string"))
          .as("text"))
    val newDocs = mutated.unionByName(fresh).localCheckpoint()

    // BATCH verdicts: applyFrame returns the SURVIVORS (newDocs
    // anti-joined against its candidate pairs)
    val batchKept = graft.tools.RunDedupIndex
      .applyFrame(spark, newDocs, s"$dir/index")
      .select(col("doc_id")).as[Long].collect().toSet
    val allNew = newDocs.select("doc_id").as[Long].collect().toSet
    val batchDropped = allNew -- batchKept

    // STREAM verdicts: the same docs through the index-fed Bloom gate
    // as a real MemoryStream micro-batch
    val newRows = newDocs.as[(Long, String)].collect()
    val input = MemoryStream[Doc]
    val out = StreamDedup.nearDedupAgainstIndex(input.toDF(), bandIndex)
    val q = out.writeStream
      .format("memory").queryName("sd_idx_parity")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sdip-").toString)
      .start()
    val streamKept = try {
      input.addData(newRows.zipWithIndex.map { case ((id, t), i) =>
        Doc(ts(i % 50), id, t)
      }.toSeq)
      q.processAllAvailable()
      spark.table("sd_idx_parity").select("doc_id")
        .as[Long].collect().toSet
    } finally q.stop()

    // the planted mutations must actually be candidates (the spec is
    // vacuous otherwise) and the fresh docs must survive both paths
    assert(batchDropped.nonEmpty && batchKept.nonEmpty,
      s"degenerate fixture: dropped=${batchDropped.size} kept=${batchKept.size}")
    assert(fresh.select("doc_id").as[Long].collect()
      .forall(batchKept.contains))
    assert(streamKept == batchKept,
      s"stream/batch verdicts diverged: streamOnly=" +
        s"${(streamKept -- batchKept).take(5)} batchOnly=" +
        s"${(batchKept -- streamKept).take(5)}")
  }
}
