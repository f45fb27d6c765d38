package graft.ops

import graft.SparkSpec

/** Bounded k-core peeling: cascades, stable cores, and normalization. */
class KCoreSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int = 3) =
    KCore.kcorePeel(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("a path CASCADES away under k=2: each round peels new endpoints") {
    // 1-2-3-4-5: round 1 drops 1,5; round 2 drops 2,4; round 3 empties
    assert(peel(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2)
      .isEmpty)
    // with only ONE round the cascade is visibly incomplete
    assert(peel(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2,
      rounds = 1) == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("K4 with a pendant tail: the tail peels, the 3-core survives") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = peel(k4 :+ (4L, 9L), k = 3)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
  }

  test("directions, duplicates and self-loops normalize before peeling") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(peel(messy, k = 2) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
