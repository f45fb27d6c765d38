package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drift-report semantics beyond the oracled fixture: the exact
  * tolerance boundary (integer cross-multiplication, no float rate),
  * zero-row sides, and argument validation.
  */
class DataQualitySpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def frame(nulls: Int, rows: Int = 100) =
    (0 until rows).map(i =>
      (i.toLong, if (i < nulls) null else s"v$i")).toDF("id", "c")

  test("drift verdict sits exactly on the integer tolerance boundary") {
    // prev 0% nulls; cur 5% = exactly tolerance -> within (<=); 6% -> out
    def verdict(curNulls: Int): Int =
      DataQuality.drift(frame(0), frame(curNulls), Seq("c"),
        tolerancePct = 5)
        .select("within_pct").as[Int].collect().head
    assert(verdict(5) == 1, "5% vs 5% tolerance must pass (<=)")
    assert(verdict(6) == 0, "6% must fail")
  }

  test("a rate IMPROVEMENT beyond tolerance also flags (abs delta)") {
    val v = DataQuality.drift(frame(10), frame(0), Seq("c"),
      tolerancePct = 5)
      .select("within_pct").as[Int].collect().head
    assert(v == 0, "a 10-point drop is drift too — contracts are two-sided")
  }

  test("an empty current side reports zero rows and trips the verdict " +
      "only via the cross-multiplied form") {
    // cur_rows = 0: cross-multiplication makes both sides 0 <= 0 — the
    // rate is undefined, and the report surfaces cur_rows = 0 for the
    // caller's row-count contract rather than dividing by zero
    val out = DataQuality.drift(frame(0), frame(0, rows = 0), Seq("c"))
      .as[(String, Long, Long, Long, Long, Int)].collect().head
    assert(out == (("c", 100L, 0L, 0L, 0L, 1)))
  }

  test("argument validation") {
    intercept[IllegalArgumentException](
      DataQuality.drift(frame(0), frame(0), Seq.empty))
    intercept[IllegalArgumentException](
      DataQuality.drift(frame(0), frame(0), Seq("c"), tolerancePct = -1))
  }
}
