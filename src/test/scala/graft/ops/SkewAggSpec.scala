package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewAggSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("salted two-stage aggregation equals the plain groupBy on skewed data") {
    // 90% of rows share one hot key — the salt spreads them
    val df = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toDouble)
    }.toDF("k", "v")
    val salted = SkewAgg.sumCountSalted(df, col("k"), col("v"),
      pmod(hash(col("v")), lit(16)), keyName = "k")
      .orderBy("k").as[(String, Double, Long)].collect()
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(String, Double, Long)].collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
