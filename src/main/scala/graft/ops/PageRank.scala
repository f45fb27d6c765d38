package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — the link-importance score a crawl
  * pipeline ranks its frontier by (harvest the high-centrality hosts
  * first) and a training-data pipeline uses as a document-quality
  * prior (the CommonCrawl-derived corpora weight pages by host rank).
  *
  * Deliberately FIXED-POINT: ranks are BIGINTs at a 10^6 scale and
  * every update is `r'(v) = ((100−d)·S + d·Σ_{u→v} (r(u) div
  * deg(u))) div 100` — floor division twice, no floating point
  * anywhere — so a fixed iteration count is bit-replayable in any
  * SQL engine (the oracle unrolls the loop as CTEs). Floats would
  * make the result partition-order-dependent through sum
  * re-association; integers make it a theorem. Dangling nodes (no
  * out-edges) simply leak their damped mass, the standard
  * simplification; duplicate edges collapse first (simple graph).
  *
  * Scale shape: per iteration ONE equi-join of the edge list with
  * the rank table on `src` (both shuffled on the same key, so the
  * exchange is reusable across iterations) and one
  * map-side-combinable groupBy on `dst`. No per-node driver state,
  * no collect — the classic bulk-synchronous PageRank, expressed
  * declaratively. Iteration count is a constant (3 by default):
  * frontier ranking needs a stable ordering, not convergence to
  * 1e-9. Arithmetic headroom: the damped update's product is bounded
  * by `dampingPct · n_nodes · scale` — inside BIGINT up to ~10^11
  * nodes at the default 10^6 scale (drop `scale` a decade per decade
  * of nodes beyond that).
  */
object PageRank {

  /** `(node, rank)` after `iters` fixed-point rounds over the DISTINCT
    * directed edges `(src, dst)`. Every node starts at `scale`
    * (= 1.0); `dampingPct` is the integer damping factor (85 = 0.85).
    */
  def pagerankFixed(
      edges: DataFrame,
      iters: Int = 3,
      scale: Long = 1000000L,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    // The graph tables are derived once and CHECKPOINTED: without the
    // cut, iteration k's lineage re-derives the (scan + join +
    // distinct) edge list O(k) times — the loop was measured 2-3×
    // slower end-to-end without it. Per-round rank checkpoints keep
    // the plan depth constant (the KMeans.fitAssign reasoning).
    // Out-degree is folded INTO the edge frame here (one wider long
    // per edge row) so the loop body never joins a degree table, and
    // `nodes` (|V| rows) is checkpointed too: both used to be "cheap"
    // per-round re-derivations, but each eager round checkpoint
    // replayed nodes' union+distinct over 2|E| rows — three extra
    // edge-scale shuffles at iters = 3 (measured ~25% of the loop).
    val dedup = edges.select(col("src"), col("dst")).distinct()
    val ed = dedup
      .join(dedup.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val base = (100L - dampingPct) * scale
    var r = nodes.withColumn("r", lit(scale))
    // Round-state lifecycle is DEPTH-DEPENDENT (r21 optimization, the
    // KMeans.fitAssign reasoning): each round's rank frame is
    // referenced exactly ONCE downstream (the next round's inflow
    // join is its only consumer — `ed`/`nodes`, the multiply-
    // referenced frames, stay checkpointed above), so for small
    // static round counts the lazy chain evaluates once inside the
    // caller's single action and per-round eager checkpoints only
    // added `iters` driver round-trips. Deeper runs keep the
    // per-round checkpoint (bounded plan depth + block release);
    // stats stay additive either way — each round joins the
    // fixed-stats checkpoints against the evolving frame once.
    val lazyChain = iters <= 4
    for (i <- 1 to iters) {
      val inflow = ed
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      val stepped = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"cast(($base + $dampingPct * coalesce(m, 0L)) div 100 " +
            "AS bigint)").as("r"))
      // the FINAL round is always eagerly checkpointed: it makes the
      // returned frame self-contained (node-sized blocks) so the
      // graph-table checkpoints can release below — in the lazy
      // regime that one job is the ONLY action the whole loop costs
      val next = if (lazyChain && i < iters) stepped
        else stepped.localCheckpoint()
      if (!lazyChain && i > 1) CheckpointUtil.free(r)
      r = next
    }
    // the final rank frame is a self-contained checkpoint; the graph
    // tables release on exit (iters = 0 returns the seed, which still
    // derives from the checkpointed nodes frame — keep only that one)
    CheckpointUtil.free(ed)
    if (iters >= 1) CheckpointUtil.free(nodes)
    r
  }
}
