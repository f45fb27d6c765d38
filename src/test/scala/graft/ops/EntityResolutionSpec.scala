package graft.ops

import graft.SparkSpec

/** Hand-computed golden-record pins: transitive closure, the
  * survivorship rule and its tie order, singleton passthrough.
  */
class EntityResolutionSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def golden(
      recs: Seq[(Long, String)], pairs: Seq[(Long, Long)]) =
    EntityResolution.goldenRecords(
        recs.toDF("id", "name"), pairs.toDF("l_id", "r_id"))
      .as[(Long, Long, String)].collect().toSet

  test("A~B, B~C closes transitively; the longest name survives") {
    val got = golden(
      Seq((1L, "ab"), (2L, "abcd"), (3L, "abc"), (4L, "zz")),
      Seq((1L, 2L), (2L, 3L)))
    assert(got == Set((1L, 3L, "abcd"), (4L, 1L, "zz")), got.toString)
  }

  test("equal-length survivorship ties break to the smallest id") {
    val got = golden(
      Seq((5L, "aaa"), (6L, "bbb")), Seq((5L, 6L)))
    assert(got == Set((5L, 2L, "aaa")), got.toString)
  }

  test("no pairs: every record is its own golden record") {
    val got = golden(Seq((7L, "x"), (8L, "y")), Seq.empty)
    assert(got == Set((7L, 1L, "x"), (8L, 1L, "y")), got.toString)
  }
}
