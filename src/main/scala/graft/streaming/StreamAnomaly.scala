package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key EWMA state: counts of still-open buckets plus the last
  * (≤ HistLen) FINALIZED bucket counts, most recent first.
  */
case class EwmaAcc(open: Map[Long, Long], hist: Seq[Long])

/** One finalized bucket's verdict — the streaming analog of a
  * `graft.ops.Anomaly.ewmaSpikes` output row.
  */
case class SpikeOut(
    event_type: String,
    bucket: Long,
    cnt: Long,
    ewma_num: Long,
    is_spike: Boolean)

/** Live ingest-telemetry spike detection — the streaming counterpart
  * of the batch [[graft.ops.Anomaly.ewmaSpikes]] detector, for the
  * monitor that must page WHILE the rogue crawler is running, not in
  * the nightly job.
  *
  * `flatMapGroupsWithState` + event-time timeout, keyed by event
  * type: state holds the open buckets inside the lateness horizon
  * (bounded: at most lateness/bucket + 1 of them) and the last 8
  * finalized counts — O(keys) state total, independent of event
  * volume. A bucket finalizes exactly once, when the watermark passes
  * its end (either a later batch's events advance it, or the timeout
  * fires); finalized buckets evaluate in ascending order against the
  * SAME scaled-integer weighted history as the batch operator, so a
  * stream replayed as a table produces bit-identical verdicts
  * (spec-pinned batch parity). Observation-indexed like the batch op:
  * an empty bucket never enters the history.
  */
object StreamAnomaly {

  val HistLen = 8
  private val WeightSum = (1L << HistLen) - 1 // 255

  /** ewma_num = Σ hist(d)·2^(HistLen−1−d) over most-recent-first
    * history — lag-1 weight 2^7 … lag-8 weight 2^0, matching the
    * batch operator's window exactly.
    */
  private def ewmaNum(hist: Seq[Long]): Long =
    hist.zipWithIndex.map { case (c, d) =>
      c * (1L << (HistLen - 1 - d))
    }.sum

  def ewmaSpikes(
      events: DataFrame,
      bucketMs: Long = 3600L * 1000L,
      maxLatenessMinutes: Int = 10,
      factor: Int = 2): Dataset[SpikeOut] = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = events.sparkSession
    import spark.implicits._

    events
      // a null event_ts can never finalize into any bucket, and
      // .getTime on it would NPE inside the stateful operator — drop
      // before keying (the batch operator's null buckets are likewise
      // meaningless; a monitored feed should not emit them)
      .filter(col("event_ts").isNotNull)
      .withWatermark("event_ts", s"$maxLatenessMinutes minutes")
      .select(col("event_type"), col("event_ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, evs: Iterator[(String, Timestamp)],
            state: GroupState[EwmaAcc]) => {
          val st = state.getOption.getOrElse(EwmaAcc(Map.empty, Nil))
          // fold the batch into the open buckets (evs is empty on a
          // pure timeout tick, so this unifies both paths)
          val open = collection.mutable.Map.empty[Long, Long] ++ st.open
          evs.foreach { case (_, ts) =>
            // truncate-toward-zero, NOT floorDiv: the batch operator
            // buckets with SQL `div` (and its DuckDB oracle with `//`),
            // both of which truncate — a floorDiv here would bucket
            // pre-epoch timestamps one off and break the documented
            // bit-parity with Anomaly.ewmaSpikes (ADVICE r15)
            val b = ts.getTime / bucketMs
            open(b) = open.getOrElse(b, 0L) + 1L
          }
          val wm = state.getCurrentWatermarkMs()
          // a bucket is complete once the watermark reaches its end —
          // no event within lateness can land in it any more
          val (done, still) = open.partition {
            case (b, _) => (b + 1) * bucketMs <= wm
          }
          var hist = st.hist
          val outs = done.toSeq.sortBy(_._1).map { case (b, cnt) =>
            val full = hist.size >= HistLen
            val num = if (full) ewmaNum(hist) else 0L
            val row = SpikeOut(key, b, cnt, num,
              full && cnt * WeightSum > num * factor)
            hist = (cnt +: hist).take(HistLen)
            row
          }
          if (still.isEmpty && outs.isEmpty && hist.isEmpty) {
            state.remove()
          } else {
            state.update(EwmaAcc(still.toMap, hist))
            if (still.nonEmpty) {
              // fire when the watermark passes the earliest open
              // bucket's end; (b+1)·bucketMs > wm holds for every
              // still-open bucket, so the timestamp is legal
              state.setTimeoutTimestamp(
                (still.keys.min + 1) * bucketMs)
            }
          }
          outs.iterator
        })
  }
}
