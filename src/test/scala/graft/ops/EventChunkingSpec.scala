package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EventOps (sessionize, as-of) and Chunking (chunk, pack) + term DF. */
class EventChunkingSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val M = 60L * 1000 * 1000 * 1000 // one minute in nanos

  // ----------------------------------------------------------- sessionize

  test("sessionize starts a new session after the gap") {
    val ev = Seq(
      // user 1: events at 0, 10, 50 min (gap 30) -> sessions 0,0,1
      (1L, 1L, 0 * M), (2L, 1L, 10 * M), (3L, 1L, 50 * M),
      // user 2: single event -> session 0
      (4L, 2L, 0 * M)).toDF("event_id", "user_id", "ts")
    val got = EventOps.sessionize(ev, gapNs = 30 * M)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("sessionize: an exactly-gap-sized silence does NOT split") {
    val ev = Seq((1L, 1L, 0 * M), (2L, 1L, 30 * M))
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.sessionize(ev, gapNs = 30 * M)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), "> gap splits, == gap does not")
  }

  test("intervalCoverage: overlap and touch merge, a nested interval " +
      "does not split the island (running max, not lag)") {
    // dur 10: user 1 = [0,10) [5,15) [15,25) one island (touch at 15
    // merges), then [40,50) a second; user 2 = [0,10) [2,12) [11,21)
    // — the SHORT middle interval ends before the first does not
    // matter, 11 < running max end 12 so one island of span 21
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 15L), (4L, 1L, 40L),
      (5L, 2L, 0L), (6L, 2L, 2L), (7L, 2L, 11L))
      .toDF("event_id", "user_id", "ts")
    val got = EventOps.intervalCoverage(ev, durUs = 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((4L, 2L, 35L, 25L)),
      2L -> ((3L, 1L, 21L, 21L))), got.toString)
  }

  // -------------------------------------------------------------- as-of

  test("withAsofTs carries the latest match at-or-before each row") {
    val ev = Seq(
      (1L, 1L, 10 * M, "purchase"),
      (2L, 1L, 20 * M, "click"),   // -> purchase at 10
      (3L, 1L, 30 * M, "purchase"),
      (4L, 1L, 40 * M, "click"),   // -> purchase at 30
      (5L, 2L, 50 * M, "click"))   // other user, no purchase -> null
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.withAsofTs(ev, col("event_type") === "purchase",
        "purchase_ts")
      .filter(col("event_type") === "click")
      .select("event_id", "purchase_ts")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(2L -> Some(10 * M), 4L -> Some(30 * M), 5L -> None))
  }

  test("withAsofTs: an equal-timestamp match is visible (>= convention)") {
    val ev = Seq(
      (1L, 1L, 10 * M, "purchase"),
      (2L, 1L, 10 * M, "click")) // same instant — match-first tie order
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.withAsofTs(ev, col("event_type") === "purchase",
        "purchase_ts")
      .filter(col("event_type") === "click")
      .select("purchase_ts").as[Option[Long]].head()
    assert(got.contains(10 * M))
  }

  // ------------------------------------------------------------ chunking

  test("chunk windows with overlap and truncates the tail") {
    val text = (0 until 100).map(i => s"w$i").mkString(" ")
    val got = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        chunkSize = 64, stride = 48)
      .select("chunk_idx", "n_tokens").as[(Int, Long)].collect().toSet
    // starts 0, 48, 96 -> lengths 64, 52, 4
    assert(got == Set((0, 64L), (1, 52L), (2, 4L)))
  }

  test("chunk: short and empty docs yield exactly one chunk") {
    val got = Chunking.chunk(
      Seq((1L, "just three words"), (2L, "")).toDF("doc_id", "text"))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("chunk hashes reconstruct the windowed text") {
    val text = "a b c d e"
    val got = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        chunkSize = 3, stride = 2)
      .orderBy("chunk_idx").select("chunk_hash").as[String].collect().toList
    val expected = Seq("a b c", "c d e", "e").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got == expected.toList)
  }

  test("packSequences assigns by exclusive running sum per source") {
    val docs = Seq(
      (1L, "s1", "a b c"), // 3 tokens, cum_excl 0 -> pack 0
      (2L, "s1", "d e"),   // cum_excl 3 -> pack 0
      (3L, "s1", "f g"),   // cum_excl 5 -> pack 1 (target 5)
      (4L, "s2", "h"))     // other source restarts -> pack 0
      .toDF("doc_id", "source", "text")
    val got = Chunking.packSequences(docs, targetTokens = 5)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  // ------------------------------------------------------------- term DF

  test("termDocFreq counts documents, not occurrences, and breaks ties") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.termDocFreq(docs, k = 2)
      .as[(String, Long)].collect().toList
    // all three terms have df=2; ties break alphabetically
    assert(got == List(("apple", 2L), ("banana", 2L)))
  }
  test("interarrivalCensus: gap buckets with a zero-gap tie bucket") {
    // user 1 at ts 0,1,1,5 -> gaps 1 (bucket 1), 0 (bucket 0),
    // 4 (bucket 3); user 2 single event contributes no gap
    val ev = Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 1L, 5L), (5L, 2L, 10L)).toDF("event_id", "user_id", "ts")
    val got = EventOps.interarrivalCensus(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 1L, 0L, 0L, 0L),
      (1L, 1L, 1L, 1L, 1L),
      (3L, 1L, 4L, 4L, 4L)))
  }

  test("interarrivalCensus: gaps never cross users; shared-bucket " +
      "stats are exact") {
    // user 1 gaps 2, 3 (both bucket 2); user 2 gap 2 (bucket 2) —
    // the cross-user 95 -> 100 jump must NOT appear as a gap
    val ev = Seq((1L, 1L, 0L), (2L, 1L, 2L), (3L, 1L, 5L),
      (4L, 2L, 100L), (5L, 2L, 102L)).toDF("event_id", "user_id", "ts")
    val got = EventOps.interarrivalCensus(ev)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 3L, 7L, 2L, 3L)))
  }
}
