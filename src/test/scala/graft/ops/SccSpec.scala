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

  test("DATA-SCALED events graph: segment-cycle SCCs match the " +
      "arithmetic prediction and outer rounds == peel depth == q") {
    // the r18 stress input (VERDICT r17 missing #4): real sf0.001
    // events, q=3 segments per user — every (user, segment) must come
    // back as ONE SCC labelled by its smallest node, and the FW-BW
    // loop must take EXACTLY q outer rounds (node ids increase along
    // each user chain, so one head segment peels per round, in
    // lockstep across users)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = 4
    // every 4th event: same real stream, segment diameters ~5 so the
    // spec stays inside the suite budget (minLabels is O(diameter)
    // per peel — see the r18 scaladoc note); the FULL-data evidence
    // lives in RunGraphScale / SCALE.md
    val events = graft.SparkTestSession.spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .filter(org.apache.spark.sql.functions.col("event_id") % 4 === 0)
    val edges = EventOps.segmentCycleGraph(events, q)
    // explicit maxInner with headroom (ADVICE r18): minLabels
    // converges in O(segment diameter), and the %4 thinning keeps
    // diameters ~5 TODAY — but the bound must not depend on that
    // fixture accident; 256 matches RunGraphScale and survives a
    // regenerated, heavier events table
    val (labels, stats) = Scc.stronglyConnectedWithStats(
      edges, maxInner = 256)
    val got = labels.as[(Long, Long)].collect().toMap
    CheckpointUtil.free(labels)
    // independent prediction: node -> min node of its (user, seg),
    // via the same window ranking but NO graph machinery
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val expect = events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("user_id"))).cast("long"))
      .select((shiftleft(col("user_id"), 32) + col("rn")).as("node"),
        col("user_id"),
        ((col("rn") - 1) * q / col("n")).cast("long").as("seg"))
      .withColumn("scc_id", min(col("node"))
        .over(Window.partitionBy(col("user_id"), col("seg"))))
      .select(col("node"), col("scc_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect, s"${got.size} vs ${expect.size} labels; " +
      s"sample diff: ${(got.toSet -- expect.toSet).take(5)}")
    // every user in this fixture has >= q events, so the deepest
    // chain is exactly q segments -> q peel rounds, zero trims
    assert(stats.peelRounds == q && stats.trimLayers == 0 &&
      stats.outerRounds == q, stats.toString)
    // and the q dial moves the round count 1:1 (peel-depth scaling)
    val (l7, s7) = Scc.stronglyConnectedWithStats(
      EventOps.segmentCycleGraph(events, 7), maxInner = 256)
    CheckpointUtil.free(l7)
    assert(s7.peelRounds == 7 && s7.outerRounds == 7, s7.toString)
  }
}
