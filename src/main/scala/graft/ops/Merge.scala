package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance operators — MERGE-style change application and
  * snapshot diffing over plain immutable tables (the parquet-lake
  * regime: a "table" is a snapshot directory; updates arrive as change
  * sets; history is compared by diffing snapshots).
  *
  * Scale shape: both operators are single equi-join passes on the key —
  * `applyChanges` an ANTI join (base rows whose key is untouched
  * survive as-is) plus a union with the non-delete changes;
  * `diff` one FULL OUTER join with a row-comparison residual. The
  * change set is typically orders of magnitude smaller than the base,
  * so the join broadcasts; when it doesn't, both sides shuffle on the
  * key like any equi-join. No windows, no global sorts, no driver
  * state.
  */
object Merge {

  /** Apply a change set to a snapshot. `changes` carries the base
    * schema plus an `op` column: `U` (upsert an existing key), `I`
    * (insert a new key), `D` (delete the key). Each key appears at most
    * once in `changes` (last-writer conflict resolution belongs to the
    * change-set producer, where the ordering context lives).
    * Result = the next snapshot.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String): DataFrame =
    base
      .join(changes.select(col(key)), Seq(key), "left_anti")
      .unionByName(
        changes.filter(col("op") =!= "D").drop("op")
          .select(base.columns.map(col).toIndexedSeq: _*))

  /** Diff two snapshots into a change set: one row per key that was
    * inserted (`I` — key only in `after`), deleted (`D` — key only in
    * `before`), or updated (`U` — key in both, any non-key column
    * different). Unchanged keys emit nothing. Output: `(key, op)`.
    */
  def diff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val payloadCols = before.columns.filter(_ != key).toIndexedSeq
    val b = before.select(col(key).as("__b_key"),
      struct(payloadCols.map(col): _*).as("__b_payload"))
    val a = after.select(col(key).as("__a_key"),
      struct(payloadCols.map(col): _*).as("__a_payload"))
    b.join(a, col("__b_key") === col("__a_key"), "full_outer")
      .withColumn("op",
        when(col("__b_key").isNull, "I")
          .when(col("__a_key").isNull, "D")
          .when(col("__b_payload") =!= col("__a_payload"), "U"))
      .filter(col("op").isNotNull)
      .select(coalesce(col("__b_key"), col("__a_key")).as(key), col("op"))
  }
}
