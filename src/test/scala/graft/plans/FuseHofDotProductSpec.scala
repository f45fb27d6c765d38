package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.DotProductExpr
import graft.ops.Similarity

/** The HOF→native dot-product fusion: the rule must rewrite exactly
  * the `aggregate(zip_with(a,b,_*_), 0.0, _+_)` float-array pattern
  * (bit-identical results, including null poisoning), and must leave
  * every near-miss formulation on the built-in path.
  */
class FuseHofDotProductSpec extends SparkSpec {

  private def hofDot(aSql: String, bSql: String) =
    spark.range(1).selectExpr(s"$aSql as a", s"$bSql as b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))

  private def fused(plan: org.apache.spark.sql.DataFrame): Boolean =
    plan.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProductExpr]))

  private def hasHof(plan: org.apache.spark.sql.DataFrame): Boolean =
    plan.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[ArrayAggregate]))

  test("float-array HOF dot product fuses to DotProductExpr") {
    val df = hofDot("array(float(1.5), float(-2.25), float(3.5))",
      "array(float(0.5), float(4.0), float(2.0))")
    assert(fused(df) && !hasHof(df))
    val expected = Seq(1.5f -> 0.5f, -2.25f -> 4.0f, 3.5f -> 2.0f)
      .map { case (x, y) => (x * y).toDouble }.sum
    assert(df.head.getDouble(0) == expected)
  }

  test("fused semantics: empty arrays yield the 0.0 seed") {
    val df = hofDot("array()", "array()")
    // array() is array<string>; force the float typing via cast
    val f = hofDot("cast(array() as array<float>)",
      "cast(array() as array<float>)")
    assert(fused(f))
    assert(f.head.getDouble(0) == 0.0)
    assert(!fused(df)) // string arrays stay on the built-in path
  }

  test("fused semantics: ragged lengths and null elements poison to NULL") {
    val ragged = hofDot("array(float(1), float(2))", "array(float(3))")
    assert(fused(ragged) && ragged.head.isNullAt(0))
    val nullElem = hofDot("array(float(1), cast(null as float))",
      "array(float(3), float(4))")
    assert(fused(nullElem) && nullElem.head.isNullAt(0))
    val nullArr = hofDot("cast(null as array<float>)", "array(float(3))")
    assert(fused(nullArr) && nullArr.head.isNullAt(0))
  }

  test("a -0.0 seed does not fuse (its empty-array result is -0.0)") {
    val df = spark.range(1)
      .selectExpr("cast(array() as array<float>) as a",
        "cast(array() as array<float>) as b")
      .select(org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with(
          col("a"), col("b"), (x, y) => x * y),
        org.apache.spark.sql.functions.lit(-0.0d),
        (acc, v) => acc + v).as("d"))
    assert(!fused(df) && hasHof(df))
    assert(java.lang.Double.doubleToRawLongBits(df.head.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(-0.0d))
  }

  test("double arrays do not fuse and keep HOF semantics") {
    val df = hofDot("array(double(1.5), double(2.5))",
      "array(double(2.0), double(4.0))")
    assert(!fused(df) && hasHof(df))
    assert(df.head.getDouble(0) == (1.5 * 2.0 + 2.5 * 4.0))
  }

  test("LSH bucket assignment rides the fused path end-to-end") {
    // NB: a Seq.toDF input would be folded to a LocalRelation with the
    // buckets precomputed at plan time — use Range so the projection
    // stays in the plan and the fusion is observable.
    val corpus = spark.range(2).selectExpr("id as vec_id",
      "array(float(id), float(1 - id), float(0.5), float(-0.25)) as embedding")
    val bucketed = Similarity.withBuckets(corpus, numBits = 4, dims = 4)
    assert(fused(bucketed) && !hasHof(bucketed))
    // buckets must match the driver-side replay of sign(dot) bits
    val planes = Similarity.hyperplanes(4, 4)
    val expected = Seq(
      0L -> Array(0.0f, 1.0f, 0.5f, -0.25f),
      1L -> Array(1.0f, 0.0f, 0.5f, -0.25f)).map { case (id, v) =>
      id -> planes.zipWithIndex.map { case (p, j) =>
        val d = v.zip(p).map { case (x, y) => (x * y).toDouble }.sum
        if (d >= 0.0) 1 << j else 0
      }.reduce(_ | _)
    }.toMap
    val got = bucketed.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expected)
  }

  test("graft_dot / graft_cosine are callable from SQL") {
    val r = spark.sql(
      "SELECT graft_dot(array(float(1), float(2)), array(float(3), float(4))) d, " +
        "graft_cosine(array(float(1), float(0)), array(float(1), float(0))) c")
      .head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
  }
}
