package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Native as-of join: merge semantics pinned against an in-memory
  * brute force on randomized data, plan shape pinned (AsofJoinExec,
  * both sides shuffled on their own key), edges (no match, null keys,
  * timestamp ties, empty right) exercised.
  */
class AsofJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long, Long)], names: (String, String, String)) = {
    import graft.SparkTestSession.spark.implicits._
    rows.toDF(names._1, names._2, names._3)
      .repartition(3) // force real shuffles/sorts, not a 1-partition accident
  }

  test("matches an in-memory brute force on randomized data") {
    val rnd = new Random(7)
    val lefts = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val rights = Seq.tabulate(300)(i =>
      (1000L + i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))

    val out = Asof.joinBackward(
      df(lefts, ("l_id", "l_key", "l_ts")),
      df(rights, ("r_id", "r_key", "r_ts")),
      "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_id"), coalesce(col("r_ts"), lit(-1L)).as("m_ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = lefts.map { case (id, k, t) =>
      val cands = rights.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) -1L else cands.map(_._3).max)
    }.toMap
    assert(out.size == lefts.size) // every left row exactly once
    assert(out == expected)
  }

  test("forward direction matches an in-memory brute force") {
    val rnd = new Random(13)
    val lefts = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val rights = Seq.tabulate(300)(i =>
      (1000L + i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))

    val out = Asof.joinForward(
      df(lefts, ("l_id", "l_key", "l_ts")),
      df(rights, ("r_id", "r_key", "r_ts")),
      "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_id"), coalesce(col("r_ts"), lit(-1L)).as("m_ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = lefts.map { case (id, k, t) =>
      val cands = rights.filter(r => r._2 == k && r._3 >= t)
      id -> (if (cands.isEmpty) -1L else cands.map(_._3).min)
    }.toMap
    assert(out.size == lefts.size)
    assert(out == expected)
  }

  test("forward ties: a right row at exactly t matches (>= contract)") {
    val out = Asof.joinForward(
      df(Seq((1L, 1L, 10L), (2L, 1L, 11L)), ("l_id", "l_key", "l_ts")),
      df(Seq((7L, 1L, 10L)), ("r_id", "r_key", "r_ts")),
      "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // l_ts=10 matches the ts-equal row; l_ts=11 has nothing at or after
    assert(out == Map(1L -> 7L, 2L -> -1L))
  }

  test("plan contains AsofJoinExec with both sides exchanged and sorted") {
    val out = Asof.joinBackward(
      df(Seq((1L, 1L, 10L)), ("l_id", "l_key", "l_ts")),
      df(Seq((2L, 1L, 5L)), ("r_id", "r_key", "r_ts")),
      "l_key", "r_key", "l_ts", "r_ts")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan) // SparkPlan prints sans "Exec"
    assert("hashpartitioning\\((l_key|r_key)".r
      .findAllIn(plan).size >= 2, plan)
  }

  test("timestamp ties: a right row at exactly t matches (<= contract)") {
    val out = Asof.joinBackward(
      df(Seq((1L, 1L, 10L)), ("l_id", "l_key", "l_ts")),
      df(Seq((2L, 1L, 10L)), ("r_id", "r_key", "r_ts")),
      "l_key", "r_key", "l_ts", "r_ts")
    assert(out.select("r_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("null keys and null timestamps never match, rows still emitted") {
    import graft.SparkTestSession.spark.implicits._
    val left = Seq(
      (1L, Some(1L), Some(10L)), (2L, None, Some(10L)),
      (3L, Some(1L), None)).toDF("l_id", "l_key", "l_ts").repartition(2)
    val right = Seq(
      (7L, Some(1L), Some(5L)), (8L, None, Some(1L)),
      (9L, Some(1L), None)).toDF("r_id", "r_key", "r_ts").repartition(2)
    val got = Asof.joinBackward(left, right,
      "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got == Map(1L -> 7L, 2L -> -1L, 3L -> -1L))
  }

  test("empty right side: all left rows emit with nulls") {
    import graft.SparkTestSession.spark.implicits._
    val left = df(Seq((1L, 1L, 10L), (2L, 2L, 20L)), ("l_id", "l_key", "l_ts"))
    val right = Seq.empty[(Long, Long, Long)]
      .toDF("r_id", "r_key", "r_ts")
    val got = Asof.joinBackward(left, right,
      "l_key", "r_key", "l_ts", "r_ts")
    assert(got.count() == 2 && got.filter(col("r_id").isNull).count() == 2)
  }

  test("string keys merge correctly (buffer-backed key type)") {
    import graft.SparkTestSession.spark.implicits._
    val rnd = new Random(5)
    val lefts = Seq.tabulate(300)(i =>
      (i.toLong, s"key-${rnd.nextInt(9)}", rnd.nextInt(500).toLong))
    val rights = Seq.tabulate(200)(i =>
      (1000L + i, s"key-${rnd.nextInt(9)}", rnd.nextInt(500).toLong))
    val out = Asof.joinBackward(
      lefts.toDF("l_id", "l_key", "l_ts").repartition(3),
      rights.toDF("r_id", "r_key", "r_ts").repartition(3),
      "l_key", "r_key", "l_ts", "r_ts")
      .select(col("l_id"), coalesce(col("r_ts"), lit(-1L)).as("m_ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = lefts.map { case (id, k, t) =>
      val cands = rights.filter(r => r._2 == k && r._3 <= t)
      id -> (if (cands.isEmpty) -1L else cands.map(_._3).max)
    }.toMap
    assert(out == expected)
  }

  test("self-join without renames keeps the two sides distinct") {
    import graft.SparkTestSession.spark.implicits._
    val base = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 5L))
      .toDF("id", "k", "ts")
    // right = strictly-earlier rows of the SAME frame (shared exprIds)
    val out = Asof.joinBackward(base, base.filter(col("ts") < 20L),
      "k", "k", "ts", "ts")
    // output has 6 columns (left id/k/ts + re-aliased right id/k/ts)
    assert(out.columns.length == 6)
    val rows = out.collect().map { r =>
      (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))
    }.toMap
    // row 1 (k=1,ts=10) matches itself via the filtered right side;
    // row 2 (k=1,ts=20) matches row 1 (ts=10 <= 20, row 2 filtered out);
    // row 3 (k=2,ts=5) matches itself
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), rows.toString)
  }

  test("mismatched key types fail fast at the driver") {
    import graft.SparkTestSession.spark.implicits._
    val l = Seq((1, 1L)).toDF("k", "ts")   // int key
    val r = Seq((1L, 1L)).toDF("k2", "ts2") // long key
    val e = intercept[IllegalArgumentException] {
      Asof.joinBackward(l, r, "k", "k2", "ts", "ts2")
    }
    assert(e.getMessage.contains("as-of key types differ"), e.getMessage)
  }

  test("unknown column name fails fast with the side named") {
    val l = df(Seq((1L, 1L, 1L)), ("a", "b", "c"))
    val e = intercept[IllegalArgumentException] {
      Asof.joinBackward(l, l, "nope", "a", "c", "c")
    }
    assert(e.getMessage.contains("left side has no column 'nope'"))
  }
}
