package graft.ops

import graft.SparkSpec

/** Degree-ordered triangle counting: hand-counted graphs, duplicate/
  * direction/self-loop normalization, and hub-skew correctness (the
  * case the degree ordering exists for).
  */
class TrianglesSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def summary(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    Triangles.summary(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().head

  test("K4 has 4 triangles; a path has none") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(summary(k4) == ((4L, 6L, 4L)))
    assert(summary(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((4L, 3L, 0L)))
  }

  test("duplicates, reversed directions and self-loops collapse") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(summary(messy) == ((3L, 3L, 1L)))
  }

  test("hub skew: a star closes exactly the rim triangles") {
    // hub 0 connected to rim 1..20; rim is a cycle -> each rim edge
    // closes one triangle with the hub (20), and the cycle itself
    // (length 20 > 3) closes none
    val star = (1L to 20L).map(i => (0L, i))
    val rim = (1L to 20L).map(i => (i, if (i == 20L) 1L else i + 1))
    assert(summary(star ++ rim) == ((21L, 40L, 20L)))
  }
}
