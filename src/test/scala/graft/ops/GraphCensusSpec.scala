package graft.ops

import graft.SparkSpec

/** GraphCensus on hand fixtures: every bucket boundary and both
  * reciprocity edge classes (loop, mutual pair) exercised exactly.
  */
class GraphCensusSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("degreeCensus: doubling buckets per side, duplicates collapse") {
    // 1 -> {2,3,4} (out-deg 3, bucket 2), 2 -> 3 (out-deg 1, bucket 1);
    // in: 3 has deg 2 (bucket 2), 2 and 4 deg 1 (bucket 1). The
    // duplicated (1,2) edge must not change any count.
    val e = Seq((1L, 2L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L))
      .toDF("src", "dst")
    val got = GraphCensus.degreeCensus(e)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("out", 2L, 1L, 3L, 3L, 3L),
      ("out", 1L, 1L, 1L, 1L, 1L),
      ("in", 1L, 2L, 2L, 1L, 1L),
      ("in", 2L, 1L, 2L, 2L, 2L)))
  }

  test("degreeCensus: mixed-degree bucket reports exact min/max and " +
      "summed mass") {
    // out-degrees 2 and 3 share bucket 2: n_nodes 2, deg_sum 5
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
      .toDF("src", "dst")
    val out = GraphCensus.degreeCensus(e)
      .filter($"side" === "out")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(("out", 2L, 2L, 5L, 2L, 3L)))
  }

  test("reciprocity: loops counted apart, mutual counts DIRECTED " +
      "edges, duplicates collapse") {
    // plain: (1,2),(2,1),(1,3) — the 1<->2 pair contributes 2 mutual;
    // loops: (4,4),(2,2); duplicate (1,2) collapses first
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (4L, 4L),
      (2L, 2L)).toDF("src", "dst")
    val got = GraphCensus.reciprocity(e)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 2L, 2L)))
  }

  test("reciprocity: a pure DAG has zero mutual and zero loops") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = GraphCensus.reciprocity(e)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 0L, 0L)))
  }
}
