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

  /** Seed a type-2 slowly-changing-dimension history from the first
    * snapshot: every row open (`valid_from = version`, `valid_to`
    * NULL). Columns: snapshot schema + (valid_from, valid_to) BIGINTs.
    */
  def scd2Init(snapshot: DataFrame, version: Long): DataFrame =
    snapshot.withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))

  /** Fold snapshot `version` into an SCD2 `history` ([[scd2Init]]
    * schema): open rows whose key vanished or whose payload changed
    * CLOSE at `version`; changed and brand-new keys OPEN a new row at
    * `version`; unchanged open rows and already-closed rows pass
    * through untouched. The warehouse dimension-history build, as one
    * full-outer equi-join of the OPEN slice against the snapshot plus
    * a union with the closed slice — no windows, no global sorts, and
    * the history can be folded forward snapshot by snapshot (each fold
    * touches only the open rows and the new snapshot).
    *
    * Point-in-time reconstruction is then a scan-shaped filter:
    * `valid_from <= v AND (valid_to IS NULL OR valid_to > v)` — the
    * spec pins that reconstructing each version returns exactly that
    * version's snapshot.
    */
  def scd2Apply(
      history: DataFrame,
      snapshot: DataFrame,
      key: String,
      version: Long): DataFrame = {
    val payloadCols = snapshot.columns.filter(_ != key).toIndexedSeq
    val closed = history.filter(col("valid_to").isNotNull)
    val open = history.filter(col("valid_to").isNull)
      .select(col(key).as("__k"),
        struct(payloadCols.map(col): _*).as("__po"),
        col("valid_from").as("__vf"))
    val snap = snapshot.select(col(key).as("__k2"),
      struct(payloadCols.map(col): _*).as("__pn"))
    val j = open.join(snap, col("__k") === col("__k2"), "full_outer")
    // payload comparisons are NULL-SAFE (<=>): with plain =/!= a NULL
    // payload field makes both the "changed" and the "unchanged"
    // predicates NULL and the row would silently vanish from the fold
    val closedNow = j
      .filter(col("__k").isNotNull &&
        (col("__k2").isNull || !(col("__po") <=> col("__pn"))))
      .select(col("__k").as(key), col("__po").as("__p"),
        col("__vf").as("valid_from"),
        lit(version).as("valid_to"))
    val stillOpen = j
      .filter(col("__k").isNotNull && col("__k2").isNotNull &&
        (col("__po") <=> col("__pn")))
      .select(col("__k").as(key), col("__po").as("__p"),
        col("__vf").as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    val opened = j
      .filter(col("__k2").isNotNull &&
        (col("__k").isNull || !(col("__po") <=> col("__pn"))))
      .select(col("__k2").as(key), col("__pn").as("__p"),
        lit(version).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
    val unified = closedNow.union(stillOpen).union(opened)
      .select((col(key) +:
        payloadCols.map(c => col("__p").getField(c).as(c))) :+
        col("valid_from") :+ col("valid_to"): _*)
    closed.unionByName(unified)
  }

  /** The table as of `version`: the SCD2 rows whose validity interval
    * covers it.
    */
  def scd2AsOf(history: DataFrame, version: Long): DataFrame =
    history.filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")

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
