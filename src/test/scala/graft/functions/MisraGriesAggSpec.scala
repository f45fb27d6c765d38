package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.HeavyHitters

/** The Misra-Gries typed aggregate: no-miss guarantee above N/(k+1),
  * lower-bound counts, merge across partitions, and exact end-to-end
  * heavy hitters through the recount stage.
  */
class MisraGriesAggSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("every item above N/(k+1) survives the sketch; counts are lower bounds") {
    // 1000 rows: "big" 400x, "mid" 150x, 450 unique fillers; k=8
    // bound: N/(k+1) = 111 -> big and mid MUST be present
    val rows = Seq.fill(400)("big") ++ Seq.fill(150)("mid") ++
      (0 until 450).map(i => s"u$i")
    val df = rows.toDF("w").repartition(7) // force partial+merge path
    val mg = df.agg(MisraGriesAgg.misraGries(col("w"), 8).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(mg.contains("big") && mg.contains("mid"), mg.toString)
    assert(mg.size <= 8)
    assert(mg("big") <= 400L && mg("mid") <= 150L, "counts are lower bounds")
  }

  test("exactHeavyHittersMG == GROUP BY HAVING, zipf and uniform") {
    val zipf = spark.range(1, 3000)
      .select((lit(3000) / col("id")).cast("long").as("k"))
    val mg = HeavyHitters.exactHeavyHittersMG(zipf, "k", minCount = 50L,
      k = 256).as[(Long, Long)].collect().toMap
    val naive = zipf.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 50L).as[(Long, Long)].collect().toMap
    assert(mg == naive && naive.nonEmpty)

    // uniform data where nothing qualifies: empty, not garbage
    val uniform = spark.range(500).select(col("id").as("k"))
    assert(HeavyHitters.exactHeavyHittersMG(uniform, "k", minCount = 5L,
      k = 512).count() == 0L)
  }

  test("graft_misra_gries is callable as a SQL aggregate") {
    graft.GraftExtensions.register(spark)
    val m = spark.sql(
      "SELECT graft_misra_gries(w, 4) AS mg FROM VALUES " +
        "('a'),('a'),('a'),('b'),('c') AS t(w)")
      .selectExpr("mg['a'] AS a").head
    assert(m.getLong(0) >= 1L) // 'a' dominates: must be present
  }

  test("serialization round-trips the buffer exactly") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("w")), 4)
    val buf = agg.createAggregationBuffer()
    Seq("a", "a", "b", "c").foreach { s =>
      buf.update(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        buf.getOrElse(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), 0L) + 1)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
