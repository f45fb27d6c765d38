package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental sessionization: pseudo-event compression must be
  * lossless for the gap rule — incremental == batch on every shape.
  */
class IncrementalSessionSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private val Gap = 100L

  private def ev(rows: (Long, Long)*) = // (user, ts)
    rows.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("user_id", "ts", "event_id")

  private def run(all: Seq[(Long, Long)], cutoff: Long) = {
    val df = ev(all: _*)
    val inc = EventOps.sessionsIncremental(
      EventOps.sessionSummaries(df.filter(col("ts") < cutoff), Gap),
      df.filter(col("ts") >= cutoff), Gap)
    val batch = EventOps.sessionSummaries(df, Gap)
    (inc.as[(Long, Long, Long, Long)].collect().toSet,
      batch.as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("a session spanning the cutoff merges; start and count carry") {
    // u1: 10, 50 | cutoff 60 | 120 (within gap of 50) → ONE session
    // (10, 120, 3); u2's prior session stays closed (400 far away)
    val all = Seq((1L, 10L), (1L, 50L), (1L, 120L),
      (2L, 10L), (2L, 400L))
    val (inc, batch) = run(all, cutoff = 60L)
    assert(inc == batch, s"inc=$inc batch=$batch")
    assert(inc.contains((1L, 10L, 120L, 3L)), inc.toString)
  }

  test("beyond-gap new events open a fresh session; priors untouched") {
    val all = Seq((1L, 10L), (1L, 500L), (1L, 510L))
    val (inc, batch) = run(all, cutoff = 100L)
    assert(inc == batch)
    assert(inc == Set((1L, 10L, 10L, 1L), (1L, 500L, 510L, 2L)))
  }

  test("multiple prior sessions per user never re-merge") {
    // two closed priors (gap 100 apart is > Gap), new day extends only
    // the LATEST one
    val all = Seq((1L, 0L), (1L, 300L), (1L, 650L))
    val (inc, batch) = run(all, cutoff = 600L)
    assert(inc == batch)
    assert(inc == Set((1L, 0L, 0L, 1L), (1L, 300L, 300L, 1L),
      (1L, 650L, 650L, 1L)))
    // and when the new event IS within gap of the latest prior end:
    val (inc2, batch2) = run(Seq((1L, 0L), (1L, 300L), (1L, 390L)),
      cutoff = 350L)
    assert(inc2 == batch2)
    assert(inc2 == Set((1L, 0L, 0L, 1L), (1L, 300L, 390L, 2L)))
  }

  test("empty halves degrade to plain batch on either side") {
    val all = Seq((1L, 10L), (1L, 20L))
    val (incAllPrior, b1) = run(all, cutoff = 1000L)
    assert(incAllPrior == b1)
    val (incAllNew, b2) = run(all, cutoff = 0L)
    assert(incAllNew == b2)
  }

  test("late data crossing the snapshot boundary fails LOUDLY " +
      "(ADVICE r15), never silently diverges from batch") {
    // prior covers u1 up to ts=50; a 'new' event at ts=40 violates the
    // monotonicity precondition the pseudo-event compression needs
    val prior = EventOps.sessionSummaries(ev((1L, 10L), (1L, 50L)), Gap)
    val late = ev((1L, 40L))
    val e = intercept[Exception] {
      EventOps.sessionsIncremental(prior, late, Gap)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("crosses the snapshot")),
      s"unexpected failure: $e")
    // the boundary itself is late too (ts == prior end was compressed)
    val atBoundary = intercept[Exception] {
      EventOps.sessionsIncremental(prior, ev((1L, 50L)), Gap).collect()
    }
    assert(messages(atBoundary).exists(_.contains("crosses the snapshot")))
    // a different user is unaffected by u1's prior end
    val ok = EventOps.sessionsIncremental(prior, ev((2L, 40L)), Gap)
    assert(ok.count() == 2)
  }
}
