package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the pre-flight gate a pipeline
  * runs before committing a 100 TB job (the Deequ/great-expectations
  * shape, engine-native): each rule reduces one frame to a single
  * (check, observed, passed) row, and a suite is the union of its
  * rules. Every observation is an exact integer count, so a suite
  * replays value-exactly in an external SQL engine.
  *
  * Scale shape: each rule is one column-pruned scan into a map-side-
  * combined aggregate (or one anti-join for containment); rules are
  * independent single-row frames, so the union parallelizes and
  * nothing is ever collected. Uniqueness deliberately counts via
  * `count(*) - count(DISTINCT key)` in ONE aggregate — the Expand it
  * plans is acceptable for a two-aggregate rule; suites that check
  * many keys on one table should split rules per key to keep each
  * Expand binary.
  */
object DataQuality {

  private def row(name: String, observed: Column, passed: Column) =
    (df: DataFrame) => df.agg(observed.as("observed"))
      .select(lit(name).as("check"), col("observed"),
        passed.cast("int").as("passed"))

  /** Duplicate-key count for an intended primary key: 0 ⇔ unique. */
  def uniqueness(df: DataFrame, name: String, key: Column): DataFrame =
    row(name, count(lit(1)) - count_distinct(key),
      col("observed") === 0L)(df)

  /** NULL count for a required column: 0 ⇔ complete. */
  def completeness(df: DataFrame, name: String, c: Column): DataFrame =
    row(name, count(when(c.isNull, 1)), col("observed") === 0L)(df)

  /** Rows violating a boolean invariant (NULL counts as violation). */
  def constraint(df: DataFrame, name: String, pred: Column): DataFrame =
    row(name, count(when(!coalesce(pred, lit(false)), 1)),
      col("observed") === 0L)(df)

  /** Orphan count: child keys absent from the parent key set — the
    * referential-integrity rule as a left-anti join (the build side
    * reduces to distinct keys; AQE picks broadcast when it fits).
    */
  def containment(
      child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column,
      name: String): DataFrame =
    row(name, count(lit(1)), col("observed") === 0L)(
      child.select(childKey.as("__k"))
        .join(parent.select(parentKey.as("__k")).distinct(),
          Seq("__k"), "left_anti"))

  /** A suite is the union of its rules, one row each. */
  def suite(rules: Seq[DataFrame]): DataFrame = {
    require(rules.nonEmpty, "suite needs at least one rule")
    rules.reduce(_ unionByName _)
  }

  /** Robust per-group outlier census: median/MAD flags (the
    * pre-training value screen that survives the outliers it hunts —
    * mean/stddev z-scores are dragged by the very tail they're meant
    * to catch; the median and the median absolute deviation are not).
    * A row is an outlier when `|x − median| > k·MAD`. Both medians use
    * the explicit integer nearest-rank rule (`2·rank >= n`, smallest
    * such value) so every reported number — counts, the median, the
    * MAD, all actual data values or exact arithmetic on them —
    * replays in an external engine with no percentile-convention
    * dependence.
    *
    * Output: `(group, n_rows, n_outliers, med, mad)`.
    *
    * Scale shape: two rank windows PARTITIONED BY the group — each
    * group sorts on one task, fine for dashboard-sized group counts
    * with bounded groups; a heavy-tailed million-group corpus screen
    * should use [[Sketches.histogramMergeQuantiles]] cutoffs instead
    * (mergeable, no per-group sort). The census aggregate itself is
    * map-side combinable.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(groupCol))
    def groupMedian(in: DataFrame, c: String, as: String): DataFrame =
      in.withColumn("__rn",
          row_number().over(w.orderBy(col(c))))
        .withColumn("__n", count(lit(1)).over(w))
        .filter(col("__rn") * 2 >= col("__n"))
        .groupBy(col(groupCol)).agg(min(col(c)).as(as))
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol))
    val dev = v.join(groupMedian(v, valueCol, "med"), groupCol)
      .withColumn("__d", abs(col(valueCol) - col("med")))
    dev.join(groupMedian(dev, "__d", "mad"), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__d") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        first(col("med")).as("med"), first(col("mad")).as("mad"))
  }

  /** Functional-dependency audit over declared candidate pairs — the
    * schema-profiling question "does A determine B in the data"
    * (key discovery, denormalization safety, upstream-contract
    * checks): A → B holds iff `count_distinct(A) ==
    * count_distinct(A, B)`, and the audit emits both exact counts
    * plus the violation magnitude (`n_pairs − n_det` = how many
    * extra B values the worst offenders carry in total) so a almost-
    * FD is distinguishable from a wildly false one.
    *
    * Scale shape: Catalyst splits the P-way union of per-pair
    * projections into P column-PRUNED scans, each feeding a plain
    * two-phase distinct aggregate — MEASURED FASTER than forcing the
    * single multi-distinct pass with a cache barrier (1.14 vs 1.85 s
    * at sf0.1; 3.09 vs 5.46 s at sf1), because the fused plan's
    * Expand multiplies every scan row 2·P× into the partial
    * aggregate while the split plans read only each pair's two
    * columns. P is the declared candidate list, not a schema
    * cross-product — mining candidates is the caller's policy.
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one candidate pair")
    // NULL-determinant discipline (ADVICE r17): count_distinct(a)
    // skips NULLs but count_distinct(struct(a, b)) would count them
    // (a struct with null fields is itself non-null), inflating
    // n_pairs vs n_det and failing an FD that holds over every
    // non-null determinant. Nulling the struct when a is NULL makes
    // both counts range over the same rows: the audit is about
    // non-null determinants on both sides.
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(count_distinct(col(a)).as(s"d_$i"),
        count_distinct(when(col(a).isNotNull, struct(col(a), col(b))))
          .as(s"p_$i"))
    }
    // deliberately NO cache barrier: letting column pruning split the
    // union into per-pair pruned scans measured ~40% faster than one
    // Expand-based multi-distinct pass (see the scaladoc numbers)
    val one = df.agg(aggs.head, aggs.tail: _*)
    pairs.zipWithIndex.map { case ((a, b), i) =>
      one.select(lit(a).as("determinant"), lit(b).as("dependent"),
        col(s"d_$i").as("n_det"), col(s"p_$i").as("n_pairs"),
        (col(s"p_$i") === col(s"d_$i")).cast("int").as("holds"),
        (col(s"p_$i") - col(s"d_$i")).as("violations"))
    }.reduce(_.unionByName(_))
  }

  /** Per-group winsorized summary — the robust-mean companion to
    * [[madOutliers]]: clamp each value into the group's
    * [p_lo, p_hi] nearest-rank band and report the EXACT pieces a
    * trimmed-tail dashboard reads — band bounds (actual data values),
    * clamp counts per side, and the winsorized sum over an
    * integer-valued column (so the sum replays exactly; float
    * accumulation is the cross-engine hazard the whole repo avoids).
    * Both cutoffs use the explicit integer nearest-rank rule
    * (`rank·100 >= n·p`, smallest such value).
    *
    * Output: `(group, n_rows, lo, hi, n_clamped_lo, n_clamped_hi,
    * winsorized_sum)`.
    *
    * Scale shape: same caveat as [[madOutliers]] — ONE rank window
    * partitioned by the group (per-group single-task sort; fine for
    * bounded dashboard-sized groups, use
    * [[Sketches.histogramMergeQuantiles]] cutoffs for a
    * million-group corpus screen); the clamp + census is one
    * map-side-combinable aggregate after a broadcast-sized bounds
    * join.
    */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLoPct: Int = 5,
      pHiPct: Int = 95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(0 < pLoPct && pLoPct < pHiPct && pHiPct < 100,
      s"need 0 < pLo < pHi < 100, got $pLoPct/$pHiPct")
    val w = Window.partitionBy(col(groupCol))
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val bounds = v
      .withColumn("__rn", row_number().over(w.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(w))
      .groupBy(col(groupCol))
      .agg(
        min(when(col("__rn") * 100 >= col("__n") * pLoPct, col("__v")))
          .as("lo"),
        min(when(col("__rn") * 100 >= col("__n") * pHiPct, col("__v")))
          .as("hi"))
    v.join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum(when(col("__v") < col("lo"), 1L).otherwise(0L))
          .as("n_clamped_lo"),
        sum(when(col("__v") > col("hi"), 1L).otherwise(0L))
          .as("n_clamped_hi"),
        sum(greatest(least(col("__v"), col("hi")), col("lo")))
          .as("winsorized_sum"))
  }

  /** Snapshot-drift report — the data-contract check between two runs
    * of the same table (yesterday's corpus vs today's): per tracked
    * column, row counts and NULL counts on both sides plus an in-band
    * `within_pct` verdict that the null RATE moved by at most
    * `tolerancePct` percentage points (integer cross-multiplied:
    * `|cur_nulls·prev_rows − prev_nulls·cur_rows| · 100 ≤
    * tolerance · prev_rows · cur_rows` — no float rate ever
    * materializes, so the whole report replays value-exactly). The
    * cross-products run in DECIMAL(38,0): corpus-scale counts
    * (≳3·10⁸ rows with proportional nulls) overflow a BIGINT product,
    * and non-ANSI Spark would wrap silently and flip the verdict.
    *
    * Scale shape: ONE map-side-combined aggregate per side computing
    * every tracked column's null count in the same pass (not a rule
    * per column — 2 scans total however many columns are tracked),
    * then a columns×1 explode of the two single-row frames and a
    * broadcast join on column name.
    */
  def drift(
      prev: DataFrame,
      cur: DataFrame,
      columns: Seq[String],
      tolerancePct: Int = 5): DataFrame = {
    require(columns.nonEmpty, "drift needs at least one tracked column")
    require(tolerancePct >= 0, "tolerancePct must be >= 0")
    def side(df: DataFrame, tag: String): DataFrame = {
      val aggs = count(lit(1)).as(s"__rows") +:
        columns.map(c => count(when(col(c).isNull, 1)).as(s"__n_$c"))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(map(columns.flatMap(c =>
          Seq(lit(c), col(s"__n_$c"))): _*)).as(Seq("col_name", s"${tag}_nulls")),
          col("__rows").as(s"${tag}_rows"))
    }
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    side(prev, "prev").join(side(cur, "cur"), Seq("col_name"))
      .select(col("col_name"), col("prev_rows"), col("prev_nulls"),
        col("cur_rows"), col("cur_nulls"),
        (abs(dec(col("cur_nulls")) * dec(col("prev_rows")) -
          dec(col("prev_nulls")) * dec(col("cur_rows"))) * 100 <=
          lit(tolerancePct.toLong) * dec(col("prev_rows")) * dec(col("cur_rows")))
          .cast("int").as("within_pct"))
  }

  /** First-digit frequencies in per-mille, floored — log10(1 + 1/d)
    * for d = 1..9. The floor convention is part of the contract (the
    * row sum is 995, not 1000) so the audit replays value-exactly.
    */
  val BenfordMilli: Seq[Int] = Seq(301, 176, 124, 96, 79, 66, 57, 51, 45)

  /** Benford's-law first-digit audit over a positive numeric column —
    * the classic fabricated-data screen for organically-grown
    * magnitudes (prices, populations, file sizes). One row per
    * leading digit 1..9: observed count, observed per-mille, the
    * Benford expectation, and the absolute deviation, all exact
    * integers (per-mille shares by cross-multiplied floor division
    * against the audited total, never a float ratio).
    *
    * The leading digit comes from `floor(value)` cast to BIGINT and
    * rendered as a string — floor-then-cast is the one double→int
    * path that agrees across engines (a bare double→BIGINT cast
    * truncates in ANSI Spark but ROUNDS in DuckDB). Rows below 1 are
    * excluded (no leading digit in this convention).
    *
    * Scale shape: one column-pruned scan into a 9-group map-side-
    * combined aggregate; the audited total arrives by broadcast
    * cross-join of the 1-row grand total (the repo's scalar-join
    * idiom), so nothing beyond the scan grows with the table.
    */
  def benfordAudit(df: DataFrame, value: Column): DataFrame = {
    val digit = substring(floor(value).cast("long").cast("string"), 1, 1)
      .cast("int")
    val grouped = df.filter(value >= 1)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = grouped.agg(sum(col("n")).as("__total"))
    grouped
      .crossJoin(broadcast(total))
      .withColumn("obs_milli", expr("n * 1000 div __total"))
      .withColumn("benford_milli",
        element_at(array(BenfordMilli.map(lit): _*), col("digit"))
          .cast("long"))
      .withColumn("dev_milli",
        abs(col("obs_milli") - col("benford_milli")))
      .drop("__total")
  }

  /** Re-identification risk audit over quasi-identifier combinations —
    * the k-anonymity / l-diversity screen a privacy review runs before
    * a table (or a training corpus's metadata sidecar) ships: every
    * distinct QI combination with its group size, the number of
    * distinct sensitive values inside it, and the two violation flags.
    * `at_risk` ⇔ fewer than `k` records share the combination (the
    * group re-identifies its members); `low_diversity` ⇔ fewer than
    * `l` distinct sensitive values (membership alone leaks the
    * sensitive attribute even when the group is large).
    *
    * Scale shape: ONE aggregate over the QI grouping — group size and
    * the exact distinct-sensitive count ride the same shuffle
    * (count_distinct plans a two-phase partial under it, never a
    * window), so the audit costs one pass however wide the table.
    * Flags and counts are exact integers; the whole audit replays in
    * external SQL.
    */
  def kAnonymity(
      df: DataFrame,
      quasiIdCols: Seq[String],
      sensitive: Column,
      k: Long,
      l: Long = 2L): DataFrame = {
    require(quasiIdCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(
        count(lit(1)).as("grp_n"),
        count_distinct(sensitive).as("n_sensitive"))
      .select(quasiIdCols.map(col) ++ Seq(
        col("grp_n"), col("n_sensitive"),
        (col("grp_n") < k).cast("int").as("at_risk"),
        (col("n_sensitive") < l).cast("int").as("low_diversity")): _*)
  }
}
