package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The payload currently open for a key, and since which version. */
case class ScdOpen(payload: String, since: Long)

/** A closed validity interval — one emitted changelog row. */
case class ScdClosed(key: Long, payload: String, valid_from: Long, valid_to: Long)

/** Streaming SCD2 changelog materialization — the live counterpart of
  * [[graft.ops.Merge.scd2Apply]] for an UPSERT feed: each key's state
  * holds only its open (payload, since) pair, and whenever a new
  * version carries a DIFFERENT payload the closed interval
  * `(key, old payload, since, version)` is emitted exactly once.
  * Identical-payload updates are no-ops (they neither emit nor move
  * `since`), matching the batch fold's unchanged-row passthrough; the
  * spec pins batch parity — streaming the row-level feed of a snapshot
  * sequence emits exactly the CLOSED rows of the batch scd2 chain.
  *
  * State is O(live keys) × one payload string, independent of update
  * volume. A value stream cannot observe absence, so deletes need an
  * explicit tombstone convention upstream (out of scope here —
  * the batch fold handles full-snapshot deletes).
  *
  * Payload travels as ONE string column (callers `to_json` a struct):
  * change detection is equality on the serialized form, which keeps
  * the state encoder trivial and the operator schema-agnostic.
  */
object StreamScd {

  /** `updates` = (key, payload, version) rows, versions
    * watermark-ordered ACROSS batches by the caller (within a batch
    * any order — each invocation sorts). At most one update per
    * (key, version): two conflicting payloads on the same version
    * have no defined order (the sort is stable on version alone) —
    * resolve conflicts upstream, where the ordering context lives
    * (the applyChanges contract). Emits closed intervals.
    */
  def changelog(
      updates: Dataset[(Long, String, Long)]): Dataset[ScdClosed] = {
    val spark = updates.sparkSession
    import spark.implicits._
    updates
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, String, Long)],
            state: GroupState[ScdOpen]) => {
          val sorted = rows.toArray.sortBy(_._3)
          var out = List.empty[ScdClosed]
          var cur = state.getOption
          sorted.foreach { case (_, p, v) =>
            cur match {
              case Some(ScdOpen(prev, since)) if prev != p =>
                out ::= ScdClosed(key, prev, since, v)
                cur = Some(ScdOpen(p, v))
              case None =>
                cur = Some(ScdOpen(p, v))
              case _ => () // identical payload: no-op
            }
          }
          cur.foreach(state.update)
          out.reverse.iterator
        })
  }
}
