package graft.ops

import graft.SparkSpec

class AlignmentSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def pairs(rows: Seq[(Long, Long, Long)], minMargin: Long) =
    Alignment.preferencePairs(
      rows.toDF("prompt_id", "response_id", "score"), minMargin)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

  test("chosen = top score smallest id; rejected = bottom score " +
      "largest id") {
    val got = pairs(Seq(
      // prompt 1: clear extremes
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L),
      // prompt 2: tied top (13 vs 15 at score 7 -> 13 wins) and tied
      // bottom (14 vs 16 at score 1 -> 16 loses)
      (2L, 13L, 7L), (2L, 15L, 7L), (2L, 14L, 1L), (2L, 16L, 1L)),
      minMargin = 0L)
    assert(got.toSeq == Seq(
      (1L, 11L, 12L, 7L, 3L),
      (2L, 13L, 16L, 6L, 4L)))
  }

  test("margin gate and the n >= 2 floor") {
    val got = pairs(Seq(
      (1L, 10L, 5L), (1L, 11L, 9L), // margin 4: gated out at 5
      (2L, 20L, 1L), (2L, 21L, 8L), // margin 7: kept
      (3L, 30L, 100L)), // singleton: never emits
      minMargin = 5L)
    assert(got.toSeq == Seq((2L, 21L, 20L, 7L, 2L)))
  }

  test("a fully tied group emits a margin-0 pair of distinct ids " +
      "when ungated") {
    val got = pairs(Seq((7L, 1L, 3L), (7L, 2L, 3L), (7L, 3L, 3L)),
      minMargin = 0L)
    assert(got.toSeq == Seq((7L, 1L, 3L, 0L, 3L)))
  }

  test("model-parity fuzz: Spark == the plain-Scala extreme rule on " +
      "tie-heavy pseudo-random inputs (fixed seed)") {
    val rnd = new scala.util.Random(20260815L)
    val rows = (0 until 600).map { i =>
      // few prompts + tiny score range -> dense ties, the regime
      // where a wrong tie-break hides from example tests
      (rnd.nextInt(12).toLong, i.toLong, rnd.nextInt(5).toLong)
    }
    val model = rows.groupBy(_._1).collect {
      case (p, g) if g.size >= 2 =>
        val chosen = g.minBy(r => (-r._3, r._2))
        val rejected = g.minBy(r => (r._3, -r._2))
        (p, chosen._2, rejected._2, chosen._3 - rejected._3, g.size.toLong)
    }.filter(_._4 >= 1L).toSeq.sortBy(_._1)
    assert(pairs(rows, minMargin = 1L).toSeq == model, "parity broke")
  }
}
