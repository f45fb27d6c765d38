package graft.ops

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("target == source gives exactly zero bits for every document") {
    // s_cnt == t_cnt per bucket and s_tot == t_tot, so every per-gram
    // contribution cancels — an algebraic identity of the scoring
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumps over the lazy dog"),
      (3L, "pack my box with five dozen jugs")).toDF("doc_id", "text")
    val got = Dsir.importanceBits(docs, docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 0L), (2L, 5L, 0L), (3L, 7L, 0L)))
  }

  test("on-target documents outscore off-target ones; n_grams is the " +
      "word count") {
    val source = Seq(
      (1L, "alpha beta alpha beta alpha beta"), // pure target language
      (2L, "zork gork bork zork gork bork")) // never seen by target
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val got = Dsir.importanceBits(source, target, oovBits = 20)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._2) == Seq(6L, 6L))
    val byId = got.map(g => g._1 -> g._3).toMap
    // every gram of doc 2 pays the 20-bit OOV penalty against a small
    // source surprisal — decisively below doc 1, which is in-target
    assert(byId(1L) > byId(2L), got.toString)
    assert(byId(2L) <= 6L * (3L - 20L) + 6L * 2,
      got.toString) // ~ (bits_s - oov) per gram, slack for bucketing
  }

  test("null and empty texts drop out; bounds are validated") {
    val docs = Seq((1L, "one two"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val got = Dsir.importanceBits(docs, docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L))
    intercept[IllegalArgumentException](
      Dsir.importanceBits(docs, docs, bucketHexLen = 0))
    intercept[IllegalArgumentException](
      Dsir.importanceBits(docs, docs, oovBits = 0))
  }
}
