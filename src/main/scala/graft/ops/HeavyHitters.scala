package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters in two passes — "which keys appear at least N
  * times" over a corpus whose key cardinality is far too large to
  * group-count wholesale (URLs, n-grams, user ids at 100 TB).
  *
  * Pass 1 runs Spark's `stat.freqItems` (the Karp/Shenker/
  * Papadimitriou streaming frequent-items sketch): one scan, fixed
  * memory, and the guarantee that every item with frequency above
  * `support × rows` IS in the returned candidate set (false positives
  * possible, false NEGATIVES not). Pass 2 re-scans filtered to the
  * candidates — a broadcast-sized `isin` literal — and counts exactly,
  * keeping keys with `count >= minCount`.
  *
  * The result is exactly equal to `GROUP BY key HAVING count >=
  * minCount`, but the shuffle only ever carries candidate keys: the
  * full-cardinality hash aggregate that would dominate (or OOM) the
  * naive plan never materializes. Caller contract: `support` must not
  * exceed `minCount / totalRows`, otherwise a true heavy hitter could
  * hide below the sketch threshold.
  */
object HeavyHitters {

  /** [[exactHeavyHitters]] with `support` derived from the ACTUAL row
    * count, so the no-false-negative bound `support <= minCount / N`
    * holds at any input size instead of silently breaking when the
    * data outgrows a hand-pinned constant. The count is one
    * column-pruned pass (metadata-only on plain parquet scans); the
    * derived support takes a 2× safety margin below the threshold.
    * Spark's freqItems floors support at 1e-4 (sketch size 1/support),
    * so inputs where `minCount / N < 1e-4` cannot keep the guarantee
    * in this sketch — that is detected and REJECTED here, never
    * silently degraded; use [[exactHeavyHittersMG]] with a sized `k`
    * for those.
    */
  def exactHeavyHittersAuto(
      df: DataFrame,
      key: String,
      minCount: Long): DataFrame = {
    val n = math.max(df.count(), 1L)
    val exact = minCount.toDouble / n
    val support = math.max(exact / 2.0, 1e-4)
    require(support <= exact,
      s"no-miss bound unsatisfiable in freqItems: minCount/N = $exact " +
        s"< 1e-4 sketch floor (N=$n, minCount=$minCount); " +
        "use exactHeavyHittersMG with k >= N/minCount")
    exactHeavyHitters(df, key, minCount, support)
  }

  def exactHeavyHitters(
      df: DataFrame,
      key: String,
      minCount: Long,
      support: Double): DataFrame = {
    val candidates: Seq[Any] = df.stat.freqItems(Array(key), support)
      .head().getSeq[Any](0)
    // NULL keys never enter the sketch (and isin never matches NULL,
    // three-valued logic), but GROUP BY treats NULL as a group — keep
    // the NULL rows in the recount so the HAVING contract holds exactly
    val isCandidate =
      if (candidates.isEmpty) col(key).isNull
      else col(key).isNull || col(key).isin(candidates: _*)
    df.filter(isCandidate)
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Fully distributed variant: the candidate stage is the engine's
    * own [[graft.functions.MisraGriesAgg]] typed aggregate (partial
    * sketches per partition, mergeable, one `k`-entry map as the
    * result), and candidates reach the recount through a broadcast
    * semi-join — NOTHING is ever collected to the driver, so the
    * pattern survives candidate sets too large for an `isin` literal.
    * Caller contract: `minCount > totalRows / (k+1)`, the Misra-Gries
    * no-miss bound; size `k` to the data (`k >= N/minCount`).
    */
  /** [[exactHeavyHittersMG]] with `k` derived from the ACTUAL row
    * count: the Misra-Gries no-miss bound needs `k + 1 > N / minCount`.
    * `maxK` caps the sketch's memory (each of the k entries lives in
    * every partial aggregate); exceeding it throws rather than
    * silently dropping true heavy hitters.
    */
  def exactHeavyHittersMGAuto(
      df: DataFrame,
      key: String,
      minCount: Long,
      maxK: Int = 1 << 22): DataFrame = {
    val n = math.max(df.count(), 1L)
    val needed = n / minCount + 1 // k >= ceil(N/minCount) ⇒ N/(k+1) < minCount
    require(needed <= maxK,
      s"Misra-Gries sketch would need k=$needed > maxK=$maxK entries " +
        s"for the no-miss bound (N=$n, minCount=$minCount); raise maxK " +
        "if the memory cost is acceptable")
    exactHeavyHittersMG(df, key, minCount, k = needed.toInt)
  }

  def exactHeavyHittersMG(
      df: DataFrame,
      key: String,
      minCount: Long,
      k: Int): DataFrame = {
    val keyStr = col(key).cast("string")
    val candidates = df
      .agg(graft.functions.MisraGriesAgg.misraGries(keyStr, k).as("mg"))
      .select(explode(map_keys(col("mg"))).as("__cand"))
    // NULL keys skip the sketch but form a GROUP BY group; the
    // column-pruned null-rows scan keeps the HAVING contract exact
    // (an isNull OR in the semi-join condition would force the join
    // out of the hash path)
    val matched =
      df.join(broadcast(candidates), keyStr === col("__cand"), "left_semi")
    matched.unionByName(df.filter(col(key).isNull))
      .groupBy(col(key))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
