package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session being accumulated for one user (epoch millis). */
case class SessionAcc(start: Long, end: Long, n: Long)

/** A finalized session. */
case class SessionOut(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** Streaming sessionization with custom state — the live counterpart
  * of the batch `EventOps.sessionize` (lag + running-sum) operator,
  * for feeds where sessions must close as data arrives rather than in
  * a nightly job.
  *
  * Built on `flatMapGroupsWithState` + event-time timeout: per-user
  * state holds only the OPEN session (three longs — state size is
  * O(active users), independent of event volume), the watermark both
  * bounds late data and drives timeouts, and a session is emitted
  * exactly once — either when a within-batch gap splits it or when the
  * watermark passes `session_end + gap` and the timeout fires. This is
  * the (c)-tier extension surface of SURVEY §2.9: semantics Spark's
  * built-in windowed aggregations can't express (variable-length
  * windows keyed on inactivity), done with the engine's own state
  * machinery instead of an external store.
  *
  * Ordering contract: events may arrive out of order within the
  * watermark; each invocation sorts its batch and merges into the open
  * session by the gap rule. An event older than `watermark` is dropped
  * by Spark before the function ever sees it, so a finalized session
  * can never be reopened. `maxLateness <= gap` is REQUIRED: it
  * guarantees every admitted event lies within `gap` of the open
  * session's end (`t > watermark >= maxEventTime - lateness >= end -
  * gap`), so the single-open-session merge is exactly the batch gap
  * rule. With a longer lateness an admitted event could predate the
  * open session by more than the gap and would wrongly merge.
  */
object StreamSessionize {

  def sessions(
      events: DataFrame,
      gapMinutes: Int = 30,
      maxLatenessMinutes: Int = 10): Dataset[SessionOut] = {
    require(maxLatenessMinutes >= 0 && maxLatenessMinutes <= gapMinutes,
      "maxLateness must be within [0, gap] for exact gap semantics")
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("event_ts", s"$maxLatenessMinutes minutes")
      .select(col("user_id").cast("long").as("user_id"), col("event_ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[(Long, Timestamp)],
            state: GroupState[SessionAcc]) => {
          def finalize(s: SessionAcc): SessionOut =
            SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n)

          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(finalize(s))
          } else {
            val times = evs.map(_._2.getTime).toArray
            java.util.Arrays.sort(times)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.end <= gapMs =>
                  Some(SessionAcc(math.min(s.start, t), math.max(s.end, t),
                    s.n + 1))
                case Some(s) => // in-batch gap: this session is complete
                  closed ::= finalize(s)
                  Some(SessionAcc(t, t, 1))
                case None => Some(SessionAcc(t, t, 1))
              }
            }
            cur match {
              case Some(s) =>
                val closeAt = s.end + gapMs
                val wm = state.getCurrentWatermarkMs()
                if (closeAt < wm) {
                  // the watermark already passed the would-be timeout:
                  // emit now (setTimeoutTimestamp rejects the past).
                  // Strictly-less: any future admitted event has
                  // t >= wm > closeAt, i.e. past the gap — safe.
                  closed ::= finalize(s)
                  state.remove()
                } else {
                  state.update(s)
                  // timeout must be strictly beyond the watermark; at
                  // exact equality keep the session open one tick so an
                  // on-time event at exactly end + gap can still merge
                  // (the in-batch rule is `t - end <= gap`)
                  state.setTimeoutTimestamp(math.max(closeAt, wm + 1))
                }
              case None => ()
            }
            closed.reverse.iterator
          }
        })
  }
}
