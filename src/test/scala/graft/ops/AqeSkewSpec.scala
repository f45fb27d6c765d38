package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** When does a user need [[SkewJoin.saltedInnerJoin]] at all? Spark's
  * own AQE skew-join handles the SHUFFLED-join case at runtime — this
  * spec pins that it actually engages on the unsalted twin of the
  * `skew_salted_join` stress (so the manual operator is documentation-
  * honest: AQE covers sort-merge joins; salting remains for the cases
  * AQE cannot split, i.e. skewed AGGREGATION keys and joins forced
  * through a single reducer by a later stage — see SCALE.md).
  *
  * AQE decides from runtime map-output sizes, so the spec shrinks the
  * skew thresholds to test scale rather than inflating data to the
  * 256 MB production default; the decision logic exercised is the same.
  */
class AqeSkewSpec extends SparkSpec {

  private val tuned = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](pairs: Seq[(String, String)])(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // one hot key carrying ~95% of the rows, with a high-entropy payload
  // (sha2 hex — compression can't shrink it) so the hot post-shuffle
  // partition dwarfs the 8KB threshold. The aggregates below consume
  // `payload`, so column pruning cannot strip it from the shuffle.
  private def skewedFact = spark.range(40000)
    .select(col("id"),
      when(col("id") % 20 === 0, concat(lit("cold"), col("id") % 7))
        .otherwise(lit("hot")).as("k"),
      sha2(col("id").cast("string"), 256).as("payload"))

  private def dim = {
    import graft.SparkTestSession.spark.implicits._
    (Seq(("hot", 1L)) ++ (0 until 7).map(i => (s"cold$i", 2L)))
      .toDF("k", "weight")
  }

  test("AQE splits the hot partition of the UNSALTED sort-merge join") {
    withConfs(tuned) {
      val joined = skewedFact.join(dim, "k")
        .agg(sum(col("weight")).as("w"),
          sum(length(col("payload"))).as("bytes"))
      val row = joined.collect().head
      assert(row.getLong(1) == 40000L * 64)
      // AQE rewrites the plan during execution; the executed plan must
      // show the skew-split sort-merge join
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join to engage; plan:\n$plan")
    }
  }

  test("salted join result == AQE-handled unsalted join result") {
    withConfs(tuned) {
      val unsalted = skewedFact.join(dim, "k")
        .agg(sum(col("weight")), sum(length(col("payload")))).collect().head
      val salted = SkewJoin.saltedInnerJoin(skewedFact, dim, "k",
        salt = xxhash64(col("id")), buckets = 8)
        .agg(sum(col("weight")), sum(length(col("payload")))).collect().head
      assert(unsalted == salted,
        "both mitigations must leave the answer untouched")
    }
  }

  test("below the threshold AQE leaves the join unsplit") {
    withConfs(tuned ++ Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "256MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB")) {
      val joined = skewedFact.join(dim, "k")
        .agg(sum(length(col("payload"))).as("n"))
      assert(joined.collect().head.getLong(0) == 40000L * 64)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"no partition clears 256MB at test scale; plan:\n$plan")
    }
  }
}
