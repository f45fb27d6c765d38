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

  /** Per-table routing: (table_id, route) where route ∈
    * {"area", "island", null}. Area wins ties, like the extractor
    * ordering in `cli.py:158-160,183-189`.
    */
  def routes(cells: DataFrame): DataFrame = {
    val area = AreaPipeline.tableMeta(cells)
      .select(col("table_id"), col("is_area"))
    val island = IslandPipeline.tableMeta(cells)
      .select(col("table_id"), col("match3").as("is_island"))
    area.join(island, Seq("table_id"), "full_outer")
      .select(col("table_id"),
        when(coalesce(col("is_area"), lit(false)), "area")
          .when(coalesce(col("is_island"), lit(false)), "island")
          .as("route"))
  }

  /** Dispatch + extract both families. Returns (area tagged rows,
    * island rows); each side only sees tables routed to it.
    */
  def extractAll(cells: DataFrame): (DataFrame, DataFrame) = {
    val r = routes(cells)
    val areaCells = cells.join(
      broadcast(r.filter(col("route") === "area").select("table_id")),
      "table_id")
    val islandCells = cells.join(
      broadcast(r.filter(col("route") === "island").select("table_id")),
      "table_id")
    (AreaPipeline.extract(areaCells), IslandPipeline.extract(islandCells))
  }
}
