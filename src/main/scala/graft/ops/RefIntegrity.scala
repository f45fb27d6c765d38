package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** J1 — referential-integrity check as a broadcast left-anti join: the
  * engine extension declared in SURVEY §2.3 (the reference derives
  * parent FKs by code prefix, `extractors.py:171-175,244-248`, but never
  * validates them; this operator finds the orphans).
  *
  * Scale shape: parents (provinces/regencies — at most tens of
  * thousands of rows) broadcast to every executor; the child stream is
  * scanned once with no shuffle. For parent sides too big to broadcast
  * Spark falls back to a shuffled hash join automatically if the hint
  * is dropped — callers with huge dimensions should bucket instead.
  */
object RefIntegrity {

  /** Rows of `children` whose `childKey` has no match in
    * `parents.parentKey`.
    */
  def orphans(
      children: DataFrame,
      parents: DataFrame,
      childKey: String,
      parentKey: String): DataFrame =
    children.join(
      broadcast(parents),
      children(childKey) === parents(parentKey),
      "left_anti")
}
