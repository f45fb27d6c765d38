package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HyperBallSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  /** Directed ring of n nodes: i -> (i+1) % n. ball_t(v) has exactly
    * t+1 nodes, so N(t) = n * (t + 1) — closed form.
    */
  private def ring(n: Int) =
    spark.range(0, n).select(col("id").as("src"),
      pmod(col("id") + 1, lit(n)).as("dst"))

  test("exactNeighborhood: closed-form ring counts per radius") {
    val got = HyperBall.exactNeighborhood(ring(40), maxT = 3)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0, 40L), (1, 80L), (2, 120L), (3, 160L)))
  }

  test("exactNeighborhood deduplicates converging paths") {
    // diamond: 0->1, 0->2, 1->3, 2->3 — ball_2(0) = {0,1,2,3} (3
    // reached twice, counted once)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val got = HyperBall.exactNeighborhood(e, maxT = 2)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    // t=0: 4 singletons; t=1: 0 gains {1,2}, 1 and 2 gain {3} -> 8;
    // t=2: 0 gains {3} -> 9
    assert(got == Seq((0, 4L), (1, 8L), (2, 9L)))
  }

  test("register estimate tracks exact within 10% on the ring+chord " +
      "fixture shape") {
    val n = 200
    val nd = spark.range(0, n).select(col("id").as("v"))
    val edges = nd.select(col("v").as("src"),
        pmod(col("v") + 1, lit(n)).as("dst"))
      .unionByName(nd.select(col("v").as("src"),
        pmod(col("v") + 7, lit(n)).as("dst")))
    val got = HyperBall.auditedNeighborhood(edges, maxT = 3, p = 6,
        tolPct = 10)
      .as[(Int, Long, Boolean)].collect().sortBy(_._1).toSeq
    // balls: t=0 -> 1, t=1 -> 3 ({v, v+1, v+7}), t=2 -> 6 (+{v+2,
    // v+8, v+14}), t=3 -> 10 — distinct sums of <= 3 steps from {1,7}
    assert(got.map(g => (g._1, g._2)) ==
      Seq((0, 200L), (1, 600L), (2, 1200L), (3, 2000L)))
    assert(got.forall(_._3), got.toString)
  }

  test("loops leave no pinned blocks behind (checkpoint lifecycle)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    HyperBall.auditedNeighborhood(ring(30), maxT = 2).collect()
    // the result is a literal frame of driver scalars; every round
    // table the loops pinned must have been freed on exit
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, leaked.toString)
  }
}
