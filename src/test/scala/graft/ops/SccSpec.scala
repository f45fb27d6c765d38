package graft.ops

import graft.SparkSpec

/** Hand-computed SCC fixtures: cycles, DAG periphery, bridges between
  * cycles, self-loops, and the trim/peel interplay.
  */
class SccSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def scc(edges: (Long, Long)*): Map[Long, Long] =
    Scc.stronglyConnected(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("a cycle is one SCC labeled by its minimum member") {
    assert(scc(5L -> 6L, 6L -> 7L, 7L -> 5L) ==
      Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("a DAG is all singletons (pure trim, no peel needed)") {
    assert(scc(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("two cycles joined by a ONE-WAY bridge stay separate SCCs, " +
      "and the bridge node is its own") {
    // cycle A {1,2}, bridge 2→9→10, cycle B {10,11}; 9 is a
    // path node with in AND out edges — trim cannot remove it, the
    // fwd/bwd peel must
    val got = scc(1L -> 2L, 2L -> 1L, 2L -> 9L, 9L -> 10L,
      10L -> 11L, 11L -> 10L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 9L -> 9L,
      10L -> 10L, 11L -> 10L), got.toString)
  }

  test("a reverse edge merges the cycles into one SCC") {
    val got = scc(1L -> 2L, 2L -> 1L, 2L -> 9L, 9L -> 10L,
      10L -> 11L, 11L -> 10L, 11L -> 1L)
    assert(got.values.toSet == Set(1L), got.toString)
  }

  test("self-loops are singleton SCCs; descending chains peel " +
      "without exhausting the outer bound") {
    val got = scc(3L -> 3L, 9L -> 8L, 8L -> 7L, 7L -> 6L, 6L -> 5L)
    assert(got == Map(3L -> 3L, 9L -> 9L, 8L -> 8L, 7L -> 7L,
      6L -> 6L, 5L -> 5L), got.toString)
  }

  test("condensation: sizes, out-degrees and longest-path layers on " +
      "a hand-computed two-cycle chain") {
    // 6 → cycleA{1,2,3} → cycleB{4,5} → 7: condensation is the path
    // 6 → A → B → 7 with layers 0,1,2,3
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L,
      4L -> 5L, 5L -> 4L, 6L -> 1L, 5L -> 7L).toDF("src", "dst")
    val got = Scc.condensation(edges)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1L, 1L),   // cycle A: 3 nodes, out-edge to B, layer 1
      (4L, 2L, 1L, 2L),   // cycle B: 2 nodes, out-edge to 7, layer 2
      (6L, 1L, 1L, 0L),   // source singleton
      (7L, 1L, 0L, 3L)),  // sink singleton
      got.toString)
  }

  test("condensation: diamond takes the LONGEST path layer, not the " +
      "shortest; parallel cross-component edges collapse to one") {
    // 1 → 2 → 3 → 4 and 1 → 4 twice (two distinct node pairs in the
    // same component pair would collapse — here duplicate edges do)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L, 1L -> 4L)
      .toDF("src", "dst")
    val got = Scc.condensation(edges)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 0L), (2L, 1L, 1L, 1L),
      (3L, 1L, 1L, 2L), (4L, 1L, 0L, 3L)), got.toString)
  }

  test("bowtie: core/in/out/other on a hand fixture with a tendril " +
      "and a disconnected island") {
    // core {1,2}; 3 → core (in); core → 4 (out); island cycle {5,6};
    // 3 → 7 tendril (reaches IN but never core's row — other)
    val edges = Seq(1L -> 2L, 2L -> 1L, 3L -> 1L, 2L -> 4L,
      5L -> 6L, 6L -> 5L, 3L -> 7L).toDF("src", "dst")
    val got = Scc.bowtie(edges)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "core", 2L -> "core", 3L -> "in",
      4L -> "out", 5L -> "other", 6L -> "other", 7L -> "other"),
      got.toString)
  }

  test("bowtie: giant ties break to the smaller scc_id") {
    // two 2-cycles, no path between: {1,2} wins the tie over {3,4}
    val edges = Seq(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L)
      .toDF("src", "dst")
    val got = Scc.bowtie(edges).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "core", 2L -> "core",
      3L -> "other", 4L -> "other"), got.toString)
  }

  test("brute-force parity on a deterministic mixed graph") {
    // the registry fixture shape at a smaller modulus: doubling map
    // + chords over 0..39
    val vs = (0L until 40L)
    val edges = vs.map(v => v -> ((v * 2 + 1) % 40)) ++
      vs.filter(_ % 4 == 0).map(v => v -> ((v + 10) % 40))
    val got = scc(edges: _*)
    // reference: Floyd-Warshall reachability on the driver
    val n = 40
    val reach = Array.fill(n, n)(false)
    vs.foreach(v => reach(v.toInt)(v.toInt) = true)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val expect = vs.map { v =>
      v -> (0 until n).filter(m =>
        reach(v.toInt)(m) && reach(m)(v.toInt)).min.toLong
    }.toMap
    assert(got == expect,
      s"diff: ${(got.toSet -- expect.toSet) ++ (expect.toSet -- got.toSet)}")
  }
}
