package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution consolidation — the step AFTER fuzzy matching:
  * matched record pairs connect into clusters (transitive closure —
  * A~B and B~C must land in one entity even if A and C never matched
  * directly), and each cluster collapses to one GOLDEN record under an
  * explicit survivorship rule. The rule here: canonical name = the
  * longest name in the cluster, ties to the smallest id — fully
  * deterministic, so the whole consolidation replays engine-to-engine.
  *
  * Scale shape: clustering is [[Components]] pointer jumping (O(log d)
  * rounds over the PAIR list, which an EDJoin/LSH blocking stage keeps
  * near-linear in the record count — never feed an all-pairs product);
  * survivorship is one map-side-combinable argmax aggregate over
  * (cluster, record) — no windows over the corpus, nothing quadratic.
  */
object EntityResolution {

  /** One golden record per cluster: `(cluster_id, n_members,
    * canonical_name)` where `cluster_id` is the minimum member id.
    * `records` = `(id, name)`; `pairs` = matched `(l_id, r_id)` from a
    * blocking+verify stage. Unmatched records survive as singleton
    * clusters of themselves.
    */
  def goldenRecords(records: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("l_id").as("src"), col("r_id").as("dst"))
    val labels = Components.connectedComponents(
      edges, records.select(col("id").as("node")))
    val members = records
      .join(labels, records("id") === labels("node"))
      .select(col("component"), col("id"), col("name"))
    members
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_members"),
        // argmax by (name length desc, id asc): ids are unique, so the
        // name payload never participates in the comparison
        max(struct(length(col("name")).as("len"),
          (-col("id")).as("neg"), col("name").as("nm"))).as("s"))
      .select(col("component").as("cluster_id"), col("n_members"),
        col("s.nm").as("canonical_name"))
  }
}
