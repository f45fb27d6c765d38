package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cleanse

/** Area extraction pipeline: cell tables -> province/regency/district/
  * village rows. Reference: `extractors.py:103-176` (AreaExtractor),
  * pinned by `tests/test_extractors.py:405-488`.
  *
  * Scale design: the only per-table driver-free metadata needed is the
  * header row (row 0) and the table width; both are computed by a tiny
  * `groupBy(table_id)` aggregate (one row per detected table — thousands
  * of rows at 100 TB, not billions) and broadcast-joined back onto the
  * full cell stream. Everything else is codegen'd Project/Filter; the
  * one shuffle is the province first-occurrence dedup window, partitioned
  * by code (per-code ordering only — parallel across codes).
  */
object AreaPipeline {

  /** P1 table-match predicate (`extractors.py:114-122`): row-0 headers,
    * de-kerned + lowered; `len>=2 && h(0)=="kode" &&
    * h(1).contains("nama provinsi")`.
    */
  def matchesHeader(headers: Seq[String]): Boolean = {
    val norm = headers.map(h =>
      Cleanse.normalizeWordsScala(if (h == null) "" else h).toLowerCase)
    norm.length >= 2 && norm.head == "kode" &&
      norm(1).contains("nama provinsi")
  }

  private val matchesHeaderUdf = udf((cells: Seq[String]) =>
    cells != null && matchesHeader(cells))

  /** Per-table metadata DF: (table_id, table_width, is_area).
    * One row per table; small enough to broadcast.
    *
    * Pre-filters to `row_idx === 0` before aggregating: INPUT MUST BE
    * RECTANGULAR (the camelot/pandas invariant — every ingest path in
    * this engine pads: CellTables.ofGrid, the engine's own parquet),
    * so the header row alone carries both the header text and the
    * table width — the filter is pushed to the scan and the aggregate
    * touches one row per table instead of the full stream (at 100 TB
    * the difference is a full extra pass). Sources that cannot
    * guarantee rectangularity (hand-written CellTsv files) must pass
    * through [[CellTables.rectangularize]] first; a data row wider
    * than its header would otherwise shift the width-keyed variant
    * projection. Tables with no row 0 cannot occur at the camelot
    * boundary (an empty table raises in the reference and is skipped,
    * `cli.py:190-191`).
    */
  def tableMeta(cells: DataFrame): DataFrame =
    cells.filter(col("row_idx") === 0)
      .groupBy("table_id").agg(
        max(size(col("cells"))).as("table_width"),
        max(col("cells")).as("header_cells"))
      .withColumn("is_area",
        coalesce(matchesHeaderUdf(col("header_cells")), lit(false)))
      .drop("header_cells")

  private def nonEmpty(c: Column): Column = {
    val t = Cleanse.pyTrim(c)
    when(t === "", lit(null)).otherwise(t)
  }

  /** The code/name pair extraction (`extractors.py:124-155`):
    * skip 2 header rows; trim code col 0; variant-dependent name
    * candidates (width 6 -> cols {1,3}; width >=7 -> {1,4,5,6});
    * row-wise first-non-empty coalesce; cleanse chain; non-empty mask.
    *
    * Width 2-5 tables raise IndexError in the reference and are skipped
    * by the CLI's per-table error isolation (`cli.py:190-191`) — here
    * they simply produce no rows.
    *
    * Input must have (table_id, row_idx, seq, cells); output
    * (code, name, seq).
    */
  def codeNamePairs(
      cells: DataFrame,
      requireMatch: Boolean = false,
      precomputedMeta: Option[DataFrame] = None): DataFrame = {
    // Reuse the caller's tableMeta when dispatch already computed it —
    // the inner broadcast join drops rows for tables not in `cells`.
    val meta0 = precomputedMeta.getOrElse(tableMeta(cells))
    // The reference separates matches() (the dispatch gate,
    // `cli.py:183-191`) from _extract_rows (no gate) — direct extraction
    // processes any table, like its unit tests do.
    val meta = if (requireMatch) meta0.filter(col("is_area")) else meta0
    // width gating happens once, below: `=== 6 || >= 7` subsumes any
    // minimum-width check
    val withMeta = cells
      .join(broadcast(meta), "table_id")
      .filter(col("row_idx") >= 2)

    // `get` is 0-based and null-safe for ragged rows (ANSI mode on).
    def cell(i: Int): Column = coalesce(get(col("cells"), lit(i)), lit(""))

    val code = Cleanse.pyTrim(cell(0))
    val picked6 = coalesce(nonEmpty(cell(1)), nonEmpty(cell(3)))
    val picked7 = coalesce(nonEmpty(cell(1)), nonEmpty(cell(4)),
      nonEmpty(cell(5)), nonEmpty(cell(6)))
    val picked = when(col("table_width") === 6, picked6)
      .when(col("table_width") >= 7, picked7)
      .otherwise(lit(null))
    val name = Cleanse.cleanseName(coalesce(picked, lit("")))

    withMeta
      .filter(col("table_width") === 6 || col("table_width") >= 7)
      .select(code.as("code"), name.as("name"), col("seq"))
      .filter(col("code") =!= "" && col("name") =!= "")
  }

  /** Code-length classification + parent prefixes (`extractors.py:164-176`):
    * 2->province, 5->regency(+code[:2]), 8->district(+code[:5]),
    * 13->village(+code[:8]); other lengths dropped. Province rows are
    * first-occurrence-deduped in document order (A1) — Window partitioned
    * by code, ordered by seq: parallel across codes, no global sort.
    *
    * Output: (entity, code, parent_code, name, seq); province parent_code
    * is null.
    */
  def classify(pairs: DataFrame): DataFrame = {
    val L = length(col("code"))
    val tagged = pairs.withColumn("entity",
      when(L === Cleanse.ProvinceCodeLength, "province")
        .when(L === Cleanse.RegencyCodeLength, "regency")
        .when(L === Cleanse.DistrictCodeLength, "district")
        .when(L === Cleanse.VillageCodeLength, "village"))
      .filter(col("entity").isNotNull)
      .withColumn("parent_code",
        when(col("entity") === "regency",
          Cleanse.parentPrefix(col("code"), Cleanse.ProvinceCodeLength))
          .when(col("entity") === "district",
            Cleanse.parentPrefix(col("code"), Cleanse.RegencyCodeLength))
          .when(col("entity") === "village",
            Cleanse.parentPrefix(col("code"), Cleanse.DistrictCodeLength)))

    // A1: first occurrence in document order, provinces only. Split so
    // the dedup window shuffles *only* the (tiny) province stream — a
    // single when() would force a whole-stream Window shuffle.
    val w = Window.partitionBy(col("code")).orderBy(col("seq"))
    val provinces = tagged.filter(col("entity") === "province")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val others = tagged.filter(col("entity") =!= "province")
    provinces.unionByName(others)
      .select("entity", "code", "parent_code", "name", "seq")
  }

  /** Full pipeline: cell tables -> tagged entity rows. */
  def extract(
      cells: DataFrame,
      requireMatch: Boolean = false,
      precomputedMeta: Option[DataFrame] = None): DataFrame =
    classify(codeNamePairs(cells, requireMatch, precomputedMeta))

  /** One entity stream, shaped to its output schema (SURVEY §1.2). */
  def entity(extracted: DataFrame, name: String): DataFrame = name match {
    case "province" =>
      extracted.filter(col("entity") === "province")
        .select(col("code"), col("name"), col("seq"))
    case "regency" =>
      extracted.filter(col("entity") === "regency")
        .select(col("code"), col("parent_code").as("province_code"),
          col("name"), col("seq"))
    case "district" =>
      extracted.filter(col("entity") === "district")
        .select(col("code"), col("parent_code").as("regency_code"),
          col("name"), col("seq"))
    case "village" =>
      extracted.filter(col("entity") === "village")
        .select(col("code"), col("parent_code").as("district_code"),
          col("name"), col("seq"))
    case other =>
      throw new IllegalArgumentException(s"unknown area entity: $other")
  }
}
