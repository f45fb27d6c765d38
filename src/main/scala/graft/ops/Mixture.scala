package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture budgeting: split a total token budget across
  * corpus groups (domains, languages, sources) as EQUALLY as their
  * capacities allow — the water-filling allocation. Small groups take
  * everything they have; the budget they can't absorb is re-split
  * evenly among the larger groups, so every uncapped group lands on
  * the same water level. This is the allocator behind "balance the
  * mixture, but don't upsample what isn't there".
  *
  * All-integer and deterministic: the water level is found by exact
  * BIGINT cross-multiplication (no division until the final floor) and
  * the sub-token remainder is handed out one token each to the first
  * uncapped groups in (capacity, key) order, so Σ alloc ==
  * min(budget, Σ capacity) EXACTLY and the result replays
  * bit-identically in any engine.
  *
  * Scale shape: the input here is the per-group capacity table — ONE
  * map-side-combinable aggregate over the corpus produces it, and
  * everything after runs on |groups| rows (thousands at most), so the
  * single-partition windows below are trivial by construction.
  */
object Mixture {

  /** Water-fill `budget = floor(Σcap · budgetNumer / budgetDenom)`
    * over per-group capacities `(keyCol, capCol)`. Returns one row per
    * group: `(key, capacity, alloc_tokens, capped)` where `capped`
    * marks groups that take their full capacity.
    *
    * The capped set is a PREFIX of the (cap asc, key asc) order: if
    * `cap_i·(n−i+1) > B − S_{i−1}` fails at i, it fails at every
    * j > i (caps are sorted, and the remaining budget shrinks by more
    * than one fair share) — so counting satisfying rows IS the prefix
    * length, no iterative fixpoint needed.
    */
  def waterfill(
      caps: DataFrame,
      keyCol: String,
      capCol: String,
      budgetNumer: Long = 1L,
      budgetDenom: Long = 2L): DataFrame = {
    require(budgetNumer >= 0 && budgetDenom > 0,
      s"budget fraction must be >= 0, got $budgetNumer/$budgetDenom")
    val ord = Window.orderBy(col(capCol), col(keyCol))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val whole = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val sized = caps
      .select(col(keyCol), col(capCol).cast("long").as(capCol))
      .withColumn("__i", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__prior_cap",
        coalesce(sum(col(capCol)).over(prior), lit(0L)))
      .withColumn("__total", sum(col(capCol)).over(whole))
      .withColumn("__budget",
        expr(s"__total * $budgetNumer div $budgetDenom"))
      // capped iff cap_i <= fair share of what's left at step i,
      // tested by exact cross-multiplication
      .withColumn("__capped",
        col(capCol) * (col("__n") - col("__i") + 1) <=
          col("__budget") - col("__prior_cap"))
    val k = sized
      .withColumn("__k",
        sum(when(col("__capped"), 1L).otherwise(0L)).over(whole))
      .withColumn("__spent_on_capped",
        coalesce(sum(when(col("__capped"), col(capCol))).over(whole),
          lit(0L)))
    k.withColumn("__left", col("__budget") - col("__spent_on_capped"))
      .withColumn("__m", col("__n") - col("__k"))
      .withColumn("__base", expr("CASE WHEN __m > 0 THEN __left div __m ELSE 0 END"))
      .withColumn("__rem", expr("CASE WHEN __m > 0 THEN __left % __m ELSE 0 END"))
      .withColumn("alloc_tokens",
        when(col("__capped"), col(capCol))
          .otherwise(col("__base") +
            when(col("__i") - col("__k") <= col("__rem"), 1L)
              .otherwise(0L)))
      .select(col(keyCol), col(capCol).as("capacity"),
        col("alloc_tokens"), col("__capped").as("capped"))
  }
}
