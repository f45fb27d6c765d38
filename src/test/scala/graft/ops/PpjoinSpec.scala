package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact set-similarity join (PPJoin prefix filtering): completeness
  * against a brute-force all-pairs verifier at several thresholds,
  * hand-computed counts, and the keep-first application.
  */
class PpjoinSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  /** Brute force: every (a < b) pair verified on the same hashed
    * shingle sets — the ground truth ppjoinPairs must equal exactly.
    */
  private def bruteForce(docs: DataFrame, pct: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.select(col("doc_id"),
      TextDedup.shinglesHashed(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val inter = graft.functions.TextExprs
      .sortedIntersectCount(col("sa"), col("sb"))
    sets.select(col("doc_id").as("a_id"), col("sh").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("b_id"), col("sh").as("sb")))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), inter.as("i"),
        (size(col("sa")) + size(col("sb")) - inter).as("u"))
      .filter(col("i") * 100 >= col("u") * pct)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  private def fixture: DataFrame = {
    val base = (1 to 40).map { i =>
      // 30 tokens, each doc sharing a sliding window with its
      // neighbors — a graded similarity structure around every
      // threshold, not just exact copies
      (i.toLong, (i until i + 30).map(j => s"w$j").mkString(" "))
    }
    val edits = Seq(
      (101L, (1 until 31).map(j => s"w$j").mkString(" ")), // = doc 1 re-render
      (102L, ((1 until 30).map(j => s"w$j") :+ "CHANGED").mkString(" ")),
      (103L, "totally different content with no overlap at all"))
    (base ++ edits).toDF("doc_id", "text")
  }

  test("ppjoinPairs == brute force at thresholds 50/80/100") {
    val docs = fixture
    for (pct <- Seq(50, 80, 100)) {
      val got = TextDedup.ppjoinPairs(docs, thresholdPct = pct)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = bruteForce(docs, pct)
      assert(got == want,
        s"pct=$pct: missing=${want -- got} extra=${got -- want}")
      assert(pct != 50 || want.nonEmpty, "fixture must produce pairs")
    }
  }

  test("hand-computed pair: one-token tail edit of a 30-token doc") {
    // docs 1 and 102: 28 shingles each; only the FINAL gram contains
    // the edited 30th token -> inter 27, union 29
    val pairs = TextDedup.ppjoinPairs(fixture, thresholdPct = 50)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(pairs((1L, 102L)) == ((27L, 29L)), pairs.get((1L, 102L)).toString)
    // the case-identical re-render shares the whole set
    assert(pairs((1L, 101L)) == ((28L, 28L)))
  }

  test("ppjoinKeep drops later members of qualifying pairs only") {
    val kept = TextDedup.ppjoinKeep(fixture, thresholdPct = 80)
      .select("doc_id").as[Long].collect().toSet
    // 101 duplicates doc 1 (J=1.0) and 102 is a 27/29=0.93 near-dup
    // of doc 1 -> both drop; 103 is unrelated -> kept; the base docs
    // are each other's sliding neighbors: doc i vs i+1 shares 27 of
    // 29 grams (0.93) -> every base doc after 1 drops
    assert(!kept.contains(101L) && !kept.contains(102L))
    assert(kept.contains(103L) && kept.contains(1L))
  }
}
