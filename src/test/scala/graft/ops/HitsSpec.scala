package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integer HITS on closed-form fixtures: the unnormalized
  * mutual-reinforcement sums are exact, so every assertion is an
  * equality.
  */
class HitsSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def hitsMap(edges: org.apache.spark.sql.DataFrame,
      rounds: Int = 2): Map[Long, (Long, Long)] =
    Hits.hitsFixed(edges, rounds).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("star: center hub compounds as d^2, leaves stay pure " +
      "authorities") {
    // 0 -> {1,2,3,4}
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val got = hitsMap(e)
    // a1(leaf) = 1, h1(0) = 4, a2(leaf) = 4, h2(0) = 16
    assert(got(0L) == (16L, 0L))
    (1L to 4L).foreach(l => assert(got(l) == (0L, 4L), s"leaf $l: $got"))
  }

  test("shared authority couples two hubs; degree decides magnitude") {
    // hubs 10 (-> a,b) and 11 (-> b,c): b is the shared authority
    val e = Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L))
      .toDF("src", "dst")
    val got = hitsMap(e)
    // a1: 1->1, 2->2, 3->1; h1: 10 -> 1+2 = 3, 11 -> 2+1 = 3
    // a2: 1->3, 2->6, 3->3; h2: 10 -> 3+6 = 9, 11 -> 6+3 = 9
    assert(got(1L) == (0L, 3L) && got(2L) == (0L, 6L) &&
      got(3L) == (0L, 3L))
    assert(got(10L) == (9L, 0L) && got(11L) == (9L, 0L))
  }

  test("duplicate edges collapse (simple graph) and 1 round stops " +
      "after the first reinforcement") {
    val e = Seq((0L, 1L), (0L, 1L), (0L, 2L)).toDF("src", "dst")
    val got = hitsMap(e, rounds = 1)
    // dedup: 0 -> {1,2}; a1 = 1 each, h1(0) = 2
    assert(got(0L) == (2L, 0L))
    assert(got(1L) == (0L, 1L) && got(2L) == (0L, 1L))
  }

  test("cycle is symmetric: every node identical hub and auth") {
    val n = 5
    val e = spark.range(0, n).select(col("id").as("src"),
      pmod(col("id") + 1, lit(n)).as("dst"))
    val got = hitsMap(e)
    assert(got.size == n)
    assert(got.values.toSet.size == 1, got.toString)
    // each round multiplies by the single in/out degree 1: stays 1
    assert(got(0L) == (1L, 1L))
  }
}
