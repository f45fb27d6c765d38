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
  *   1. closed-neighborhood min — every node takes the min label over
  *      itself and its neighbors in ONE join + partial-aggregated `min`
  *      (self-loops added up front make the closed form a single
  *      aggregate; a hot node's fan-in is combined map-side, never
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
  *  - The edge frame — the big, static join side — is hash-partitioned
  *    on the join key once, before the loop; the checkpoint preserves
  *    that partitioning, so per-round shuffles move only the label
  *    frame (|V_active| rows), never the edges.
  *  - The driver loop holds only the iteration counter and one decimal
  *    label-sum per round (an exact convergence witness: labels are
  *    per-node non-increasing, so sum equality ⇒ fixpoint) — no label
  *    data ever leaves the executors.
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
    // Iterate ONLY over edge-incident nodes: singleton nodes (the vast
    // majority after an LSH candidate stage — most documents have no
    // near-dup) never enter a propagation round; they are unioned back
    // as their own component at the end. Iteration cost is O(|E|), not
    // O(|corpus|).
    val active = sym.select(col("src").as("node")).distinct()
      .localCheckpoint()
    // Self-loops turn the neighbor-min into a min over the CLOSED
    // neighborhood, so one join + partial-agg per round replaces the
    // round-6/7 shape's join + agg + second left-join. Pre-partitioning
    // on `src` (the per-round join key) is captured by the checkpoint's
    // LogicalRDD outputPartitioning, so the edge side — the big, static
    // side — is shuffled ONCE here and never again inside the loop;
    // each round only exchanges the (small, changing) label frame.
    val symSelf = sym
      .union(active.select(col("node").as("src"), col("node").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    var labels = active.select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    // Convergence = label-sum fixpoint, and it is EXACT, not a hash
    // heuristic: both steps are per-node non-increasing (closed-
    // neighborhood min includes self; the jump replaces lbl with
    // lbl(lbl) ≤ lbl since every label satisfies lbl(m) ≤ m), so the
    // decimal sum strictly decreases until the fixpoint and sum
    // equality implies every node is unchanged. This folds convergence
    // detection into a near-free aggregate over the round's already-
    // checkpointed output instead of carrying a `prev` column through
    // an extra join.
    var prevSum: Option[java.math.BigDecimal] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val stepped = symSelf
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("lbl")).as("lbl"))
      // pointer jump, lbl ← lbl(lbl): self-join with explicit subquery
      // aliases (both sides derive from the same plan); the aggregate's
      // exchange is shared between the two sides via ReusedExchange
      val jumped = stepped.as("a")
        .join(stepped.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
        .localCheckpoint()
      val sumRow = jumped.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      val lblSum = Option(sumRow.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      converged = prevSum.exists(_.compareTo(lblSum) == 0)
      prevSum = Some(lblSum)
      labels = jumped
      iter += 1
    }
    require(converged, s"components did not converge in $maxIter rounds")
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
