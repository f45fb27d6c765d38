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
    * Each family's tableMeta is built ONCE and threaded through both
    * the routing filter and the extract pipeline (the identical
    * broadcast subtrees inside one action are then deduplicated by
    * ReuseExchange), instead of being recomputed per consumer.
    */
  def extractAll(cells: DataFrame): (DataFrame, DataFrame) = {
    val areaMeta = AreaPipeline.tableMeta(cells)
    val islandMeta = IslandPipeline.tableMeta(cells)
    val r = routesFromMeta(areaMeta, islandMeta)
    val areaCells = cells.join(
      broadcast(r.filter(col("route") === "area").select("table_id")),
      "table_id")
    val islandCells = cells.join(
      broadcast(r.filter(col("route") === "island").select("table_id")),
      "table_id")
    (AreaPipeline.extract(areaCells, precomputedMeta = Some(areaMeta)),
      IslandPipeline.extract(islandCells, precomputedMeta = Some(islandMeta)))
  }
}
