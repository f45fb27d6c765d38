package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P3 first-match dispatch (`cli.py:183-191`): for each detected table,
  * try extractors in order [area, island]; the first whose `matches()`
  * fires owns the table. Expressed as mutually-exclusive per-table tags
  * (the short-circuit `break` becomes tag precedence), so each branch
  * pipeline sees only its own tables.
  */
object Dispatch {

  /** Routing from precomputed per-table metadata: (table_id, route)
    * where route ∈ {"area", "island", null}. Area wins ties, like the
    * extractor ordering in `cli.py:158-160,183-189`.
    */
  def routesFromMeta(areaMeta: DataFrame, islandMeta: DataFrame): DataFrame = {
    val area = areaMeta.select(col("table_id"), col("is_area"))
    val island = islandMeta
      .select(col("table_id"), col("match3").as("is_island"))
    area.join(island, Seq("table_id"), "full_outer")
      .select(col("table_id"),
        when(coalesce(col("is_area"), lit(false)), "area")
          .when(coalesce(col("is_island"), lit(false)), "island")
          .as("route"))
  }

  /** Per-table routing computed from scratch. */
  def routes(cells: DataFrame): DataFrame =
    routesFromMeta(AreaPipeline.tableMeta(cells),
      IslandPipeline.tableMeta(cells))

  /** Dispatch + extract both families. Returns (area tagged rows,
    * island rows); each side only sees tables routed to it.
    *
    * Route resolution is folded INTO each side's metadata instead of
    * materializing a routes frame and broadcast-filtering the cell
    * stream per side: the extract pipelines already broadcast-join
    * their (tiny, per-table) meta onto the cells, so pre-filtering the
    * meta to the routed tables makes that one join do the dispatch as
    * well — one meta aggregate and ONE broadcast join per family,
    * rather than the previous routes full_outer join plus a second
    * broadcast route-filter join on the full stream. Area wins ties
    * like the extractor ordering (`cli.py:158-160,183-189`): an
    * area-matched table is removed from the island meta by a tiny
    * meta-vs-meta broadcast anti-join.
    */
  /** [[extractAll]] over a SHARED one-exchange materialization of the
    * cell stream. Each family needs the stream at least twice (the
    * per-table meta aggregate and the extract pass; the area side a
    * third time for the province-dedup split), and when `cells` is a
    * COMPUTED frame — a synthesized fixture, a join product, anything
    * without scan-level pushdown — every branch re-runs the whole
    * upstream pipeline. Here the stream goes through one
    * repartition exchange that AQE's ReuseExchange serves to every
    * branch, so the upstream runs exactly once.
    *
    * Keep plain [[extractAll]] for pushdown-capable sources (the
    * CellTsv DSv2 path): there the meta pass prunes to `row_idx == 0`
    * AT THE SCAN — far cheaper than forcing the full stream through an
    * exchange. (The multi-sink [[ExtractJob]] needs neither: it
    * `cache()`s both extracted frames explicitly.)
    *
    * Barrier mechanics (the same canonical-equality discipline as the
    * tfidf/surprisal exchange reuse in
    * [[graft.ops.TextAnalysis.tfidfTopTerms]]): branch subtrees only
    * reuse an exchange if they stay canonically EQUAL, so the filter
    * above the repartition is ONE indivisible nondeterministic
    * always-true conjunct ([[graft.functions.OpaqueTrueExpr]]) that
    * both stops branch-specific predicates from being pushed across
    * the exchange AND references every cell column, so per-branch
    * column pruning (e.g. the province-dedup branch needing `seq`
    * where the meta aggregate does not) cannot make the exchange
    * subtrees diverge. The filter is a runtime no-op.
    */
  def extractAllShared(cells: DataFrame): (DataFrame, DataFrame) = {
    val shared = cells
      .repartition(cells.sparkSession.sparkContext.defaultParallelism)
      .where(graft.functions.CurationExprs.opaqueTrue(
        col("table_id"), col("page"), col("row_idx"), col("seq"),
        col("cells")))
    extractAll(shared)
  }

  def extractAll(cells: DataFrame): (DataFrame, DataFrame) = {
    val areaRouted = AreaPipeline.tableMeta(cells)
      .filter(col("is_area"))
    val islandRouted = IslandPipeline.tableMeta(cells)
      .filter(col("match3") && col("header_idx") >= 0)
      .join(broadcast(areaRouted.select("table_id")), Seq("table_id"),
        "left_anti")
    (AreaPipeline.extract(cells, precomputedMeta = Some(areaRouted)),
      IslandPipeline.extract(cells, precomputedMeta = Some(islandRouted)))
  }
}
