package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextDedup

/** Native shingling/intersection must match the composed built-in
  * formulations exactly — same tokenization (trailing empties kept),
  * same short-text fallback, same first-occurrence distinct order,
  * same array_intersect null/dup semantics.
  */
class TextExprsSpec extends SparkSpec {

  private val texts = Seq(
    "The quick  brown Fox jumps over the lazy dog",
    "one two",
    "solo",
    "",
    "a b a b a b", // duplicate grams -> distinct must dedup in order
    "  padded   text with   runs  ")

  private def docs = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("native shingles == HOF shingles, order and all") {
    for (n <- Seq(1, 2, 3, 8)) {
      val rows = docs.select(
        TextDedup.shingles(col("text"), n).as("native"),
        TextDedup.shinglesHof(col("text"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n")
      }
    }
  }

  test("intersectCount == size(array_intersect) incl. nulls and dups") {
    val cases = Seq(
      ("array('a','b','c')", "array('b','c','d')"),
      ("array('a','a','b')", "array('a')"), // dup in a counts once
      ("array('a', cast(null as string))", "array(cast(null as string))"),
      ("array('a')", "array(cast(null as string))"),
      ("cast(array() as array<string>)", "array('a')"))
    cases.foreach { case (a, b) =>
      val r = spark.range(1)
        .selectExpr(s"$a as a", s"$b as b")
        .select(
          TextExprs.intersectCount(col("a"), col("b")).as("native"),
          size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
        .head
      assert(r.getLong(0) == r.getLong(1), s"a=$a b=$b")
    }
  }

  test("jaccardCounts values survive the native swap") {
    val pairs = spark.range(1)
      .selectExpr("cast(0 as long) as doc_a", "cast(4 as long) as doc_b")
    val r = TextDedup.jaccardCounts(pairs, docs, shingleSize = 2).head
    // doc 0 and doc 4 share the bigram count computed by definition
    val sh0 = texts(0).toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq.distinct
    val sh4 = texts(4).toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq.distinct
    val inter = sh0.toSet.intersect(sh4.toSet).size.toLong
    assert(r.getLong(2) == inter)
    assert(r.getLong(3) == sh0.size + sh4.size - inter)
  }
}
