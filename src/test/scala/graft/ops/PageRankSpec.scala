package graft.ops

import graft.SparkSpec

/** Fixed-point integer PageRank: hand-computed three-round ranks on a
  * tiny graph, cycle stability, and edge-multiplicity collapse.
  */
class PageRankSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("hand-computed ranks: 1→2, 2→1, 3→1 after 3 rounds") {
    // S = 10^6, d = 85. r0 = S everywhere, all out-degrees 1.
    // r1: n1 = (15e6 + 85·(r0(2)+r0(3)))/100 = 1,850,000;
    //     n2 = 1,000,000; n3 (no in-edges) = 150,000.
    // r2: n1 = (15e6 + 85·1,150,000)/100 = 1,127,500;
    //     n2 = (15e6 + 85·1,850,000)/100 = 1,722,500; n3 = 150,000.
    // r3: n1 = (15e6 + 85·1,872,500)/100 = 1,741,625;
    //     n2 = (15e6 + 85·1,127,500)/100 = 1,108,375; n3 = 150,000.
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.pagerankFixed(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1741625L, 2L -> 1108375L, 3L -> 150000L),
      got.toString)
  }

  test("a pure cycle is a fixed point at exactly the initial rank") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.pagerankFixed(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L), got.toString)
  }

  test("duplicate edges collapse before degrees are counted") {
    val dup = Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val simple = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val a = PageRank.pagerankFixed(dup, iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.pagerankFixed(simple, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, s"$a vs $b")
  }
}
