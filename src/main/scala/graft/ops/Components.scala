package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair graph — the
  * clustering step that turns near-duplicate PAIRS (MinHash/SimHash/
  * cosine candidates) into duplicate GROUPS, so a dedup pass can keep
  * one canonical document per cluster instead of per pair.
  *
  * Algorithm: min-label propagation with pointer jumping.
  * Each round does
  *   1. neighbor-min — every node takes the min label in its closed
  *      neighborhood (one shuffle join on node id + a partial-aggregated
  *      `min`, so a hot node's fan-in is combined map-side, never
  *      collected on one reducer);
  *   2. pointer jump — every node re-reads the label OF its label
  *      (`lbl ← lbl(lbl)`), halving the depth of every label tree.
  * Rounds to converge: O(log diameter) thanks to the jump (a plain
  * propagation needs O(diameter) — a 500-long chain would take 500
  * shuffles; with jumping it takes ~9). This is the same doubling idea
  * as the Kiveris et al. "Connected Components in MapReduce" two-phase
  * (large-star/small-star) algorithm, in DataFrame form.
  *
  * Scale notes:
  *  - The driver loop holds only the iteration counter and a `count()`
  *    of changed labels per round — no label data ever leaves the
  *    executors.
  *  - `localCheckpoint` truncates lineage each round; without it the
  *    plan doubles per iteration and Catalyst analysis itself becomes
  *    the bottleneck. On a multi-node cluster prefer
  *    `spark.sparkContext.setCheckpointDir` + `checkpoint()` (fault-
  *    tolerant); local mode has no reliable storage, so localCheckpoint
  *    is the correct variant here.
  *  - Input edges should come from an LSH/banding candidate stage, so
  *    |E| is near-linear in |V| — never feed an all-pairs product.
  */
object Components {

  /** Connected components of `edges(src, dst)` over the node universe
    * `nodes(node)` (nodes absent from every edge stay singletons).
    * Returns `(node, component)` where `component` is the minimum node
    * id reachable from `node`.
    */
  def connectedComponents(
      edges: DataFrame,
      nodes: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // Iterate ONLY over edge-incident nodes: singleton nodes (the vast
    // majority after an LSH candidate stage — most documents have no
    // near-dup) never enter a propagation round; they are unioned back
    // as their own component at the end. Iteration cost is O(|E|), not
    // O(|corpus|).
    val active = sym.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var labels = active.select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      // the round's input label rides along as `prev`, so convergence
      // detection below is a filter over the already-materialized
      // round output — not a third join per round
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
      // self-join: explicit subquery aliases keep the two sides'
      // attributes unambiguous (both derive from the same plan)
      val jumped = stepped.as("a")
        .join(stepped.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"), col("a.prev").as("prev"),
          coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
        .localCheckpoint()
      changed = jumped.filter(col("lbl") =!= col("prev")).count()
      labels = jumped.select("node", "lbl")
      iter += 1
    }
    require(changed == 0, s"components did not converge in $maxIter rounds")
    val singletons = nodes.select(col("node"))
      .join(active, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    labels.withColumnRenamed("lbl", "component").unionByName(singletons)
  }

  /** Cluster summary: one row per non-singleton component with its size
    * and canonical (minimum) member.
    */
  def componentSizes(labeled: DataFrame): DataFrame =
    labeled.groupBy("component")
      .agg(count(lit(1)).as("size"), min(col("node")).as("canonical"))
      .filter(col("size") > 1)
}
