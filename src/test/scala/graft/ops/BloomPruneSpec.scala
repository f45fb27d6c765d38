package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomPrune contract: result-identical to the plain join (no false
  * negatives), with the might-contain predicate evaluated on the probe
  * side BEFORE the join — that placement is the whole point.
  */
class BloomPruneSpec extends SparkSpec {

  private def probe = spark.range(0, 10000)
    .select(col("id").as("pk"), (col("id") % 97).as("payload"))
  private def build = spark.range(0, 10000, 37)
    .select(col("id").as("bk"))

  test("prunedEquiJoin is row-identical to the plain join") {
    val pruned = BloomPrune.prunedEquiJoin(probe, build, "pk", "bk")
      .select("pk", "payload", "bk")
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "payload", "bk")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() == plain.count())
  }

  test("mightMatch keeps every true match (no false negatives)") {
    val kept = BloomPrune.mightMatch(probe, build, col("pk"), col("bk"))
    val trueKeys = build.collect().map(_.getLong(0)).toSet
    val keptKeys = kept.select("pk").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(keptKeys),
      s"bloom dropped true keys: ${trueKeys -- keptKeys}")
  }

  test("plan filters with BloomFilterMightContain below the join") {
    val plan = BloomPrune.prunedEquiJoin(probe, build, "pk", "bk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the predicate must sit on the probe side, not above the join:
    // the Filter line carrying might_contain appears AFTER (deeper
    // than) the join operator line in the plan tree printout
    val joinIdx = plan.indexOf("Join")
    val bloomIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      s"bloom predicate not under the join:\n$plan")
  }
}
