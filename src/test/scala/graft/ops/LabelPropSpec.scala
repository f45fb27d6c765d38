package graft.ops

import graft.SparkSpec

/** Hand-computed synchronous-LPA pins: community split, tie rule,
  * bipartite oscillation under bounded rounds, normalization.
  */
class LabelPropSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], rounds: Int) =
    LabelProp.propagate(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("two triangles + bridge resolve into two communities") {
    // {1,2,3} and {4,5,6} bridged 3-4; worked by hand round by round:
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4
    // r2: 1→1 2→1 3→1 4→4 5→3 6→3
    // r3: 1→1 2→1 3→1 4→3 5→3 6→3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    assert(lpa(edges, 3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(lpa(edges, 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("a star oscillates synchronously — bounded rounds stay exact") {
    // hub 1, leaves 2..5: r1 hub→2 leaves→1; r2 hub→1 leaves→2;
    // r3 hub→2 leaves→1 — the bipartite flip-flop the fixed round
    // count makes deterministic instead of divergent
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(lpa(star, 3) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("directions, duplicates and self-loops normalize first") {
    // one undirected edge 1-2 (plus noise): both adopt the other's
    // label each round; 1 round → swapped labels
    val messy = Seq((2L, 1L), (1L, 2L), (1L, 1L), (2L, 1L))
    assert(lpa(messy, 1) == Map(1L -> 2L, 2L -> 1L))
  }
}
