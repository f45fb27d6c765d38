package graft.ops

import graft.SparkSpec

/** EDJoin-style edit-distance linkage: typo probes link to their
  * originals within the threshold, beyond-threshold probes don't, and
  * the rarest-gram prefix recovers when the typo lands inside a gram.
  */
class FuzzyJoinSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val left = Seq(
    (1L, "chocolate lace ivory"),
    (2L, "goldenrod spring green"),
    (3L, "midnight plum almond")).toDF("l_id", "l_name")

  private def link(probes: Seq[(Long, String)], maxDist: Int) =
    FuzzyJoin.editBlockedJoin(left,
      probes.toDF("r_id", "r_name"), maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("one-substitution probes link to their originals at dist 1") {
    val got = link(Seq(
      (10L, "chocoXate lace ivory"),   // mid-gram substitution
      (11L, "goldenrod spring greeX"), // tail substitution
      (12L, "zzz unrelated zzz")), maxDist = 1)
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1)), got.toString)
  }

  test("maxDist bounds the verify: dist-2 probes need maxDist = 2") {
    val probe = Seq((20L, "chXcolate lace ivorX"))
    assert(link(probe, maxDist = 1).isEmpty)
    assert(link(probe, maxDist = 2) == Set((1L, 20L, 2)))
  }

  test("maxDist = 0 degenerates to exact name equality") {
    val got = link(Seq((30L, "midnight plum almond"),
      (31L, "midnight plum almonds")), maxDist = 0)
    assert(got == Set((3L, 30L, 0)), got.toString)
  }
}
