package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing for co-located joins — the scale technique the engine
  * prescribes for repeated large-fact joins where neither side fits a
  * broadcast: both tables written bucketed by the join key land
  * co-partitioned on disk, and the join plans with ZERO shuffle
  * exchanges (sort-merge over pre-bucketed scans).
  */
class BucketedJoinSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf; managed test tables are dropped
    // below, which removes their data from the default warehouse
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_customers")

    (1L to 1000L).map(i => (i, i % 100, s"o$i")).toDF("o_id", "cust", "tag")
      .write.bucketBy(8, "cust").sortBy("cust")
      .mode("overwrite").saveAsTable("bj_orders")
    (0L until 100L).map(i => (i, s"c$i")).toDF("cust", "name")
      .write.bucketBy(8, "cust").sortBy("cust")
      .mode("overwrite").saveAsTable("bj_customers")

    val joined = spark.table("bj_orders")
      // disable broadcast so the bucketed sort-merge path is what's
      // under test (the small side would otherwise broadcast)
      .hint("merge")
      .join(spark.table("bj_customers"), "cust")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 1000L)

    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_customers")
  }
}
