package graft.ops

import graft.SparkSpec

/** Physical-plan pins for the dispatch + extract product: routing is
  * folded into each family's per-table metadata, so the ONLY joins in
  * either side's plan are broadcast hash joins of that tiny meta — a
  * shuffle (sort-merge) join of the cell stream would be a scale
  * regression (the stream side must never move for dispatch).
  */
class DispatchPlanSpec extends SparkSpec {

  private def plans(): (String, String) = {
    val cells = CellTables.ofGrids(spark,
      Seq(Fixtures.dfArea, Fixtures.dfIsland))
    val (area, island) = Dispatch.extractAll(cells)
    (area.queryExecution.executedPlan.toString,
      island.queryExecution.executedPlan.toString)
  }

  test("dispatch joins are broadcast-only; the cell stream never shuffles for routing") {
    val (area, island) = plans()
    for ((name, p) <- Seq("area" -> area, "island" -> island)) {
      assert(p.contains("BroadcastHashJoin"),
        s"$name side must broadcast its meta:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$name side must not shuffle the stream for a join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name side:\n$p")
    }
    // the one stream shuffle on the area side is the province
    // first-occurrence window (partitioned by code) — nothing else
    assert(area.contains("Window"), area)
  }
}
