package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-profiling operators: exact pairwise covariance (the
  * feature-correlation screen a curation pipeline runs before training
  * a quality classifier) and the 2-D Pareto frontier (skyline — the
  * "best tradeoff" rows under two competing objectives).
  *
  * Both are scan-shaped: one map-side-combinable aggregate (cov) or
  * one group + one tiny window (skyline) — no self-joins, nothing
  * quadratic, so both survive a 100 TB input unchanged.
  */
object Profiling {

  /** Exact pairwise covariance (scaled) over the given numeric
    * columns, in long format `(x_col, y_col, n, cov_num)` with
    * `cov_num = n·Σxy − Σx·Σy` computed over values scaled to integers
    * by `scaleDigits` decimal digits — all DECIMAL(38,0) arithmetic,
    * so the result is EXACT (a double sum would depend on aggregation
    * order and never replay across engines). The true covariance is
    * `cov_num / (n² · 10^(2·scaleDigits))`; callers divide at the
    * edge if they want the float.
    *
    * One pass over the input computes all k·(k+1)/2 sums
    * map-side-combined; the pair explosion happens AFTER the aggregate
    * on a single row.
    */
  def covMatrix(
      df: DataFrame,
      cols: Seq[String],
      scaleDigits: Int = 4): DataFrame = {
    require(cols.nonEmpty, "covMatrix needs at least one column")
    val pow = math.pow(10, scaleDigits)
    // fixed-point per column: round half-up to an integer, carried as
    // DECIMAL(38,0) so sums and products never overflow or round
    val fx = cols.map(c =>
      round(col(c) * pow).cast("decimal(38,0)").as(s"__fx_$c"))
    val scaled = df.select(fx: _*)
    val pairs = for {
      (x, i) <- cols.zipWithIndex
      (y, j) <- cols.zipWithIndex
      if i <= j
    } yield (x, y)
    val aggs =
      count(lit(1)).cast("decimal(38,0)").as("__n") +:
        cols.map(c => sum(col(s"__fx_$c")).as(s"__s_$c")) ++:
        pairs.map { case (x, y) =>
          sum((col(s"__fx_$x") * col(s"__fx_$y")).cast("decimal(38,0)"))
            .as(s"__sxy_${x}__$y")
        }
    val one = scaled.agg(aggs.head, aggs.tail: _*)
    // explode the single stats row into (x, y, n, cov_num) rows
    val entries = pairs.map { case (x, y) =>
      struct(lit(x).as("x_col"), lit(y).as("y_col"), col("__n").as("n"),
        (col("__n") * col(s"__sxy_${x}__$y") -
          col(s"__s_$x") * col(s"__s_$y"))
          .cast("decimal(38,0)").as("cov_num"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select(col("e.x_col"), col("e.y_col"),
        col("e.n").cast("long").as("n"), col("e.cov_num"))
  }

  /** Per-group least-squares trend: for each group the OLS slope of
    * `yCol` on `xCol`, carried as the EXACT fixed-point numerator
    * `n·Σxy − Σx·Σy` and denominator `n·Σxx − (Σx)²` (DECIMAL(38,0);
    * the shared scale cancels in the ratio) plus the slope as their
    * single IEEE division. Degenerate groups (zero x-variance) emit
    * `degenerate = true` and slope 0 — never a NULL that would be
    * sort-unstable in a dump. One map-side-combinable aggregate; the
    * output is |groups| rows.
    */
  def olsTrend(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      scaleDigits: Int = 4): DataFrame = {
    val pow = math.pow(10, scaleDigits)
    def fx(c: String) =
      round(col(c) * pow).cast("decimal(38,0)")
    val agg = df
      .select(col(groupCol), fx(xCol).as("__x"), fx(yCol).as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum((col("__x") * col("__x")).cast("decimal(38,0)")).as("__sxx"),
        sum((col("__x") * col("__y")).cast("decimal(38,0)")).as("__sxy"))
    agg.select(
      col(groupCol),
      col("__n").cast("long").as("n"),
      (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
        .cast("decimal(38,0)").as("slope_num"),
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .cast("decimal(38,0)").as("slope_den"))
      .withColumn("degenerate", col("slope_den") === 0)
      .withColumn("slope",
        when(col("degenerate"), lit(0.0))
          .otherwise(col("slope_num").cast("double") /
            col("slope_den").cast("double")))
  }

  /** The 2-D Pareto frontier of `df` under (minimize `xCol`, maximize
    * `yCol`): rows for which no other row is at-most-equal on x and
    * at-least-equal on y with one strict. Emitted with the input's
    * columns, frontier rows only.
    *
    * Strict-dominance algebra without a self-join: group to the max y
    * per distinct x — an x is on the frontier iff its best y beats
    * every better-x best (a NOT EXISTS formulation is O(n²) on ties).
    * The running max over x-order is decomposed two-level (the
    * `Sampling.prefixSums` pattern) instead of one global ordered
    * window: with a near-unique x (a continuous price) the grouped
    * frame is corpus-sized and a bare `Window.orderBy(x)` funnels all
    * of it through ONE task's sort. Here x buckets by VALUE RANGE off
    * a broadcast (min, max) scalar — deterministic, order-preserving,
    * and free of the range-sampling nondeterminism that could bucket
    * the two consumers of the frame differently — each bucket pays a
    * bucket-local window, and only the nBuckets-row bucket-maxima
    * frame runs an ordered window on one task before broadcasting
    * back. A value-skewed x degrades toward fewer effective buckets
    * (worst case = the old single-task shape), never toward
    * incorrectness.
    */
  def paretoFrontier(
      df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val best = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__best_y"))
    val stats = best.agg(
      min(col(xCol)).cast("double").as("__xmin"),
      max(col(xCol)).cast("double").as("__xmax"))
    val bucketed = best.crossJoin(broadcast(stats))
      .withColumn("__bkt",
        when(col("__xmax") === col("__xmin"), lit(0L))
          .otherwise(least(
            floor((col(xCol).cast("double") - col("__xmin")) * nBuckets /
              (col("__xmax") - col("__xmin"))),
            lit(nBuckets - 1L)).cast("long")))
      .drop("__xmin", "__xmax")
    // bucket-local exclusive running max; buckets are value-contiguous
    val inBucket = Window.partitionBy(col("__bkt")).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPrev = bucketed
      .withColumn("__prev_in", max(col("__best_y")).over(inBucket))
    // exclusive running max ACROSS buckets: an ordered window over the
    // nBuckets-row maxima frame only (one tiny task), broadcast back
    val acrossBuckets = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPrev = bucketed.groupBy(col("__bkt"))
      .agg(max(col("__best_y")).as("__bmax"))
      .withColumn("__prev_bkt", max(col("__bmax")).over(acrossBuckets))
      .select(col("__bkt"), col("__prev_bkt"))
    // greatest() ignores nulls (first bucket / first row in bucket), so
    // the combined exclusive running max is null only at the global min
    val frontier = withPrev.join(broadcast(bucketPrev), "__bkt")
      .withColumn("__prev_best",
        greatest(col("__prev_in"), col("__prev_bkt")))
      .filter(col("__prev_best").isNull ||
        col("__best_y") > col("__prev_best"))
      .select(col(xCol), col("__best_y").as(yCol))
    df.join(frontier, Seq(xCol, yCol), "left_semi")
  }

  /** Exact Spearman rank-correlation moments between two integer
    * columns — the monotone-association screen (does document length
    * track token count? does a quality score track surprisal?) that a
    * float `corr()` answers irreproducibly. Ranks are DOUBLED average
    * tie ranks (`2·below + ties + 1` — the average of a tied run
    * times 2, so ranks stay integers under any tie pattern), and the
    * output is ONE row of the exact Pearson-on-ranks building blocks:
    * `n` plus `num = n·Σrxry − Σrx·Σry` and the two variance
    * denominators, each carried in DECIMAL(38,0) and emitted as
    * canonical digit STRINGS (the r15 rule: wide exact integers never
    * ride a final schema as DECIMAL). ρ = num / √(denx·deny) at the
    * caller's edge; num = denx = deny exactly ⟺ ρ = 1. Exact while
    * n⁴ < 10³⁸ (n ≲ 3·10⁹ rows); past that, pre-bucket the values —
    * Spearman on a monotone re-bucketing is the same statistic
    * coarsened, and ANSI decimal overflow fails loudly, never
    * silently.
    *
    * Scale shape: NO global rank sort. Each column ranks through its
    * value HISTOGRAM — a map-side-combined count aggregate — whose
    * exclusive prefix sums come from [[Sampling.prefixSums]] (the
    * two-level decomposition; `levels` ≥ 3 for >10⁹ distinct values),
    * so "count of rows below" never funnels the corpus through one
    * task. Rows meet their ranks in two value-keyed equi-joins
    * (histogram side is |distinct values|, AQE broadcasts when small)
    * and the moments fold in one map-side-combined aggregate.
    */
  def spearmanMoments(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      bucketSize: Int = 4096,
      levels: Int = 2): DataFrame = {
    val base = df.select(xCol.cast("long").as("__x"),
      yCol.cast("long").as("__y"))
    def withRank(d: DataFrame, v: String, r: String): DataFrame = {
      val hist = d.groupBy(col(v)).agg(count(lit(1)).as("__c"))
      val ranks = Sampling
        .prefixSums(hist, col(v), col("__c"), bucketSize, Nil, levels)
        .select(col(v),
          (col("prefix") * 2 + col("__c") + 1).as(r))
      d.join(ranks, v)
    }
    val ranked = withRank(withRank(base, "__x", "__rx"), "__y", "__ry")
    def dec(c: Column) = c.cast("decimal(38,0)")
    ranked
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(dec(col("__rx"))).as("__sx"),
        sum(dec(col("__ry"))).as("__sy"),
        sum(dec(col("__rx")) * dec(col("__ry"))).as("__sxy"),
        sum(dec(col("__rx")) * dec(col("__rx"))).as("__sx2"),
        sum(dec(col("__ry")) * dec(col("__ry"))).as("__sy2"))
      .select(col("__n").cast("long").as("n"),
        (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
          .cast("decimal(38,0)").cast("string").as("num_str"),
        (col("__n") * col("__sx2") - col("__sx") * col("__sx"))
          .cast("decimal(38,0)").cast("string").as("denx_str"),
        (col("__n") * col("__sy2") - col("__sy") * col("__sy"))
          .cast("decimal(38,0)").cast("string").as("deny_str"))
  }

  /** Join-blowup pre-flight: before running `left ⨝ right` on
    * `keyCol`, compute EXACTLY what the join would produce — per-key
    * output multiplicity `l_cnt · r_cnt` for the `topK` hottest keys
    * plus, on every row, the total output rows, total matched keys,
    * and the hottest key's share — from the two key-count aggregates
    * alone, never the join itself. This is the skew audit a 100 TB
    * pipeline runs before committing a shuffle: the count tables are
    * KEY-space-sized (they join on the key, map-side-combined), so
    * the audit costs two grouped counts and a key-keyed join of the
    * counts — output-bound work never happens.
    *
    * Emits `(key, l_cnt, r_cnt, out_rows, total_out_rows,
    * matched_keys, top_share_pct)` for the topK keys by `out_rows`
    * (ties to the smallest key) — all exact integers.
    */
  def joinBlowupAudit(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val lc = left.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("l_cnt"))
    val rc = right.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("r_cnt"))
    val per = lc.join(rc, Seq("key"))
      .select(col("key"), col("l_cnt"), col("r_cnt"),
        (col("l_cnt") * col("r_cnt")).as("out_rows"))
    val totals = per.agg(
      sum(col("out_rows")).as("total_out_rows"),
      count(lit(1)).as("matched_keys"),
      max(col("out_rows")).as("__max_out"))
    per
      .crossJoin(broadcast(totals))
      .withColumn("top_share_pct",
        expr("__max_out * 100 div total_out_rows"))
      .orderBy(col("out_rows").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("l_cnt"), col("r_cnt"), col("out_rows"),
        col("total_out_rows"), col("matched_keys"),
        col("top_share_pct"))
  }

  /** Corpus-concentration audit: the Gini coefficient of the per-doc
    * token-length distribution (is the token budget spread out or
    * held by a few giant documents?) and the Herfindahl index of the
    * language mix (is the corpus effectively monolingual?) — the two
    * one-number diagnostics a mixture-rebalancing pass reads first.
    *
    * Both are EXACT integer parts-per-million. Gini runs on the
    * counts-of-counts HISTOGRAM, never the corpus: the mean absolute
    * difference folds into `Σ_v n_v·(v·cumN_<v − cumT_<v)` over the
    * distinct-length frame (bounded by the longest document, not the
    * corpus), so the only corpus-scale work is one map-side-combined
    * length count; the ordered window runs on the tiny histogram. The
    * ppm divisions promote to DECIMAL(38,0) first (`1e6·S` passes
    * 2^63 near ~1e9 docs) and come back via integral `div` — floor
    * semantics on both engines, result ≤ 1e6 so the BIGINT cast is
    * safe by construction.
    */
  def corpusInequality(docs: DataFrame): DataFrame = {
    val lens = docs.filter(length(trim(col("text"))) > 0)
      .select(col("lang"), TextAnalysis.wordCount(col("text")).as("v"))
    val hist = lens.groupBy(col("v")).agg(count(lit(1)).as("n"))
    val before = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = hist
      .withColumn("cum_n", coalesce(sum(col("n")).over(before), lit(0L)))
      .withColumn("cum_t",
        coalesce(sum(col("n") * col("v")).over(before), lit(0L)))
      .select(col("n"), col("v"),
        (col("n").cast("decimal(38,0)") *
          (col("v") * col("cum_n") - col("cum_t"))).as("s"))
    val gini = contrib.agg(
      sum(col("n")).as("n_docs"),
      sum(col("n") * col("v")).as("total_tokens"),
      count(lit(1)).as("n_lengths"),
      sum(col("s")).as("sum_abs_half"))
      .select(col("n_docs"), col("total_tokens"), col("n_lengths"),
        // SumAbs = 2·Σs; Gini = SumAbs / (2·N·T) — the 2s cancel
        expr("(sum_abs_half * 1000000) div " +
          "(CAST(n_docs AS DECIMAL(38,0)) * total_tokens)")
          .cast("long").as("gini_token_ppm"))
    val hhi = lens.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_langs"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("sq"),
        sum(col("c")).as("nn"))
      .select(col("n_langs"),
        expr("(sq * 1000000) div (CAST(nn AS DECIMAL(38,0)) * nn)")
          .cast("long").as("hhi_lang_ppm"))
    gini.crossJoin(broadcast(hhi))
  }
}
