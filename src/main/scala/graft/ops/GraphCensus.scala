package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural census over a directed edge list — the pre-flight
  * screen every graph algorithm in this engine ([[PageRank]],
  * [[Hits]], [[KCore]], [[Components]]) deserves before it runs:
  * the degree distribution decides whether the iterative joins need
  * a skew guard, and the reciprocity mix decides whether a directed
  * algorithm is even meaningful (a near-symmetric graph wants the
  * undirected variant).
  *
  * Everything is exact integers on doubling buckets (the
  * `length(bin())` bit-length idiom — ⌊log₂ d⌋ + 1, no float log),
  * so both censuses replay bit-for-bit in external SQL.
  */
object GraphCensus {

  /** Degree histogram in doubling buckets, both directions at once:
    * one row per (`side` ∈ in|out, `bucket` = bit length of the
    * degree) with the node count, summed degree mass, and exact
    * min/max degrees in the bucket. A power-law graph shows node
    * counts decaying geometrically across buckets with near-constant
    * edge mass; a hot top bucket with most of the mass is the
    * skew-guard signal.
    *
    * Scale shape: distinct the edges once (one shuffle), then each
    * side is a map-side-combined degree aggregate (8-byte keys) and a
    * ~60-bucket second aggregate over the node-degree table; the two
    * sides union AFTER aggregation, so nothing downstream of the
    * degree tables grows with the graph. No sort, no window — the
    * doubling bucket replaces the rank structure, computed pointwise.
    */
  def degreeCensus(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    def side(key: String, tag: String): DataFrame =
      e.groupBy(col(key).as("node")).agg(count(lit(1)).as("deg"))
        .select(lit(tag).as("side"), col("deg"))
    side("src", "out").unionByName(side("dst", "in"))
      .groupBy(col("side"),
        length(bin(col("deg"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("deg_sum"),
        min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))
  }

  /** Reciprocity summary — ONE row: distinct non-loop edge count,
    * self-loop count, and how many of the directed edges have their
    * reverse also present (`n_mutual` counts DIRECTED edges, so a
    * reciprocated pair contributes 2; `n_mutual / n_edges` is the
    * textbook reciprocity ratio, left to the reader as a division of
    * two exact BIGINTs).
    *
    * Scale shape: one distinct, one self-equi-join on the reversed
    * key (hash shuffle both sides, same partitioning), one global
    * fold — no enumeration of pairs ever materializes beyond the
    * matched edges themselves.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val loops = e.filter(col("src") === col("dst"))
      .agg(count(lit(1)).as("n_loops"))
    val plain = e.filter(col("src") =!= col("dst"))
    val rev = plain.select(col("dst").as("src"), col("src").as("dst"))
      .withColumn("__r", lit(1L))
    plain.join(rev, Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("n_edges"),
        // sum over ZERO rows is NULL, not 0: without the outer
        // coalesce an all-loop (or empty) edge list emits a NULL
        // n_mutual that no external replay agrees on (ADVICE r16)
        coalesce(sum(coalesce(col("__r"), lit(0L))), lit(0L))
          .as("n_mutual"))
      .crossJoin(broadcast(loops))
  }
}
