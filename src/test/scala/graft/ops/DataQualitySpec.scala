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

  test("madOutliers: hand-computed median/MAD and the planted outlier") {
    // group g: values 1..7 plus a 1000 outlier -> n=8, median rule
    // 2*rn>=8 -> 4th smallest = 4.0; deviations sorted:
    // [0,1,1,2,2,3,3,996] -> MAD = 4th smallest = 2.0; cutoff 3*2=6:
    // only 996 exceeds it
    val df = ((1 to 7).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val out = DataQuality.madOutliers(df, "grp", "v")
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(out == (("g", 8L, 1L, 4.0, 2.0)), out.toString)
  }

  test("madOutliers: a constant group has MAD 0 and any deviation flags") {
    val df = (Seq.fill(5)(("c", 2.0)) :+ ("c", 2.5)).toDF("grp", "v")
    val out = DataQuality.madOutliers(df, "grp", "v")
      .as[(String, Long, Long, Double, Double)].collect().head
    // median 2.0, deviations [0,0,0,0,0,0.5] -> MAD 0; 0.5 > 3*0
    assert(out == (("c", 6L, 1L, 2.0, 0.0)), out.toString)
  }

  test("kAnonymity: group sizes, sensitive diversity and both flags") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // QI group (1, "a"): 3 members, sensitive {10, 20} -> safe at
      // k=3, diverse at l=2
      (1, "a", 10L), (1, "a", 20L), (1, "a", 10L),
      // QI group (1, "b"): 2 members, all sensitive 30 -> at risk at
      // k=3 AND low diversity at l=2
      (1, "b", 30L), (1, "b", 30L),
      // QI group (2, "a"): singleton
      (2, "a", 40L)).toDF("region", "segment", "salary")
    val out = DataQuality.kAnonymity(df, Seq("region", "segment"),
        col("salary"), k = 3L, l = 2L)
      .as[(Int, String, Long, Long, Int, Int)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1, "a", 3L, 2L, 0, 0),
      (1, "b", 2L, 1L, 1, 1),
      (2, "a", 1L, 1L, 1, 1)))
  }

  test("benfordAudit: hand-computed digits, floored per-mille shares " +
      "and deviations; sub-1 rows excluded") {
    // digits: 1.2, 14.0, 180.5 -> 1 (n=3); 2.9 -> 2; 9.99, 950.0 -> 9;
    // 0.4 excluded (below 1). total = 6.
    val df = Seq(1.2, 14.0, 180.5, 2.9, 0.4, 9.99, 950.0).toDF("v")
    val got = DataQuality.benfordAudit(df, col("v"))
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      // (digit, n, n*1000 div 6, benford_milli, |obs - benford|)
      (1, 3L, 500L, 301L, 199L),
      (2, 1L, 166L, 176L, 10L),
      (9, 2L, 333L, 45L, 288L)))
  }

  test("benfordAudit: value exactly 1 is included; negatives and " +
      "zero are not") {
    val df = Seq(1.0, -5.0, 0.0, 0.999).toDF("v")
    val got = DataQuality.benfordAudit(df, col("v"))
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1, 1L, 1000L, 301L, 699L)))
  }

  test("kAnonymity rejects empty QI lists and k/l < 1") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1, 2L)).toDF("q", "s")
    intercept[IllegalArgumentException](
      DataQuality.kAnonymity(df, Seq.empty, col("s"), k = 3L))
    intercept[IllegalArgumentException](
      DataQuality.kAnonymity(df, Seq("q"), col("s"), k = 0L))
  }

  test("fdAudit: holding and violated dependencies with exact " +
      "violation magnitude; one row per declared pair") {
    // a → b holds; b → c violated twice (b=1 carries c∈{x,y},
    // b=2 carries c∈{x,z}: 4 distinct pairs vs 2 distinct b)
    val df = Seq((1L, 1L, "x"), (2L, 1L, "y"), (3L, 2L, "x"),
      (4L, 2L, "z"), (5L, 2L, "z")).toDF("a", "b", "c")
    val got = DataQuality.fdAudit(df, Seq("a" -> "b", "b" -> "c"))
      .as[(String, String, Long, Long, Int, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 5L, 5L, 1, 0L),
      ("b", "c", 2L, 4L, 0, 2L)), got.toString)
  }

  test("winsorizedStats: hand-computed nearest-rank bounds, clamp " +
      "counts and exact winsorized sum; custom percentiles") {
    // g: 1..20 → p05 rank 1 ⇒ lo=1, p95 rank 19 ⇒ hi=19; only the
    // 20 clamps down, sum = (1+..+19) + 19 = 209
    val df = (1L to 20L).map(("g", _)).toDF("grp", "v")
    val got = DataQuality.winsorizedStats(df, "grp", "v")
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(got == (("g", 20L, 1L, 19L, 0L, 1L, 209L)), got.toString)

    // heavy tail with p25/p75: [1,1,1,1,100] → lo = 2nd smallest = 1,
    // hi = 4th smallest = 1 → the 100 clamps to 1, sum = 5
    val skew = Seq(("s", 1L), ("s", 1L), ("s", 1L), ("s", 1L),
      ("s", 100L)).toDF("grp", "v")
    val got2 = DataQuality.winsorizedStats(skew, "grp", "v",
        pLoPct = 25, pHiPct = 75)
      .as[(String, Long, Long, Long, Long, Long, Long)].head()
    assert(got2 == (("s", 5L, 1L, 1L, 0L, 1L, 5L)), got2.toString)
  }
}
