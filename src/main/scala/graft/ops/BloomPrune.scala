package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter join pruning — Spark's runtime-filter machinery
  * (`InjectRuntimeFilter`) exposed as a first-class operator the caller
  * controls.
  *
  * The scale problem: joining a 100 TB fact table against a filtered
  * dimension shuffles EVERY fact row, even though only the small
  * fraction whose key survives the dimension filter can match. Spark's
  * AQE injects a bloom filter for some shapes on its own, but only
  * under cost heuristics the user can't see; this operator makes the
  * pattern explicit and deterministic:
  *
  *  1. aggregate the build side's join keys into a Bloom filter
  *     ([[BloomFilterAggregate]], the same `TypedImperativeAggregate`
  *     Spark's runtime filters use — partial sketches per partition,
  *     OR-merged, one binary blob as the result);
  *  2. attach that blob to the probe side as a SCALAR SUBQUERY (the
  *     plan executes it once and broadcasts the value with the plan —
  *     it never round-trips through user code);
  *  3. filter the probe side with [[BloomFilterMightContain]] — a
  *     codegen'd predicate, evaluated at the scan, BEFORE the join
  *     shuffle;
  *  4. run the exact join on the survivors.
  *
  * A Bloom filter has no false negatives, so step 3 never drops a
  * matching row; false positives are eliminated by the exact join in
  * step 4 — the composed result is EXACTLY the plain join, which is
  * what the oracle checks. The win is shuffle volume: probe rows that
  * cannot match die at the scan.
  */
object BloomPrune {

  /** `probe` filtered to rows whose `probeKey` might be in `build`'s
    * `buildKey` set. Keys are hashed with xxhash64 on both sides (the
    * layout `InjectRuntimeFilter` uses). NULL probe keys hash to the
    * seed and may survive; exactness comes from the join that follows.
    *
    * @param expectedItems sizes the filter's bit array (via the sketch
    *   library's optimal-m formula at 3% FPP); overshooting wastes a
    *   few KB of broadcast, undershooting costs FPP, never correctness.
    */
  def mightMatch(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      expectedItems: Long = 1000000L): DataFrame = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(buildKey))), expectedItems)
    val bloomDf = build.agg(
      ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
    val bloom = ScalarSubquery(bloomDf.queryExecution.analyzed)
    val pred = BloomFilterMightContain(
      bloom, new XxHash64(Seq(ColumnBridge.expression(probeKey))))
    probe.filter(ColumnBridge.column(pred))
  }

  /** The full pattern: bloom-prune `probe`, then exact-join the
    * survivors against `build` on `probeKey === buildKey`. Row-for-row
    * equal to the plain join (no false negatives + exact residual
    * join); the bloom pass only thins the shuffle.
    */
  def prunedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame =
    mightMatch(probe, build, col(probeKey), col(buildKey), expectedItems)
      .join(build, col(probeKey) === col(buildKey))
}
