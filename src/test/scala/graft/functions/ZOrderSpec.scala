package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton encoding: pinned against a naive bit loop, plan-level
  * behavior (codegen parity, null propagation, SQL registration), and
  * the locality property that makes it a layout key.
  */
class ZOrderSpec extends SparkSpec {

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-mask interleave equals the naive bit loop") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0L),
      (0L, 0xFFFFFFFFL), (0xFFFFFFFFL, 0xFFFFFFFFL), (-1L, 7L),
      (Long.MaxValue, Long.MinValue)) ++
      Seq.fill(200)((rnd.nextLong(), rnd.nextLong()))
    cases.foreach { case (x, y) =>
      assert(ZOrderNative.interleave(x, y) == naive(x, y), s"($x, $y)")
    }
  }

  test("first quadrants encode in the documented order") {
    // (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 — x on even bits, y on odd
    assert(ZOrderNative.interleave(0, 0) == 0L)
    assert(ZOrderNative.interleave(1, 0) == 1L)
    assert(ZOrderNative.interleave(0, 1) == 2L)
    assert(ZOrderNative.interleave(1, 1) == 3L)
    assert(ZOrderNative.interleave(2, 2) == 12L)
  }

  test("expression evaluates in-plan (codegen) identically to the static fn") {
    val df = spark.range(0, 1000)
      .select(col("id").as("x"), (col("id") * 37 % 1000).as("y"))
      .select(col("x"), col("y"), ZOrder.zorder(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrderNative.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("graft_zorder is callable from SQL; nulls propagate") {
    val rows = spark.sql(
      "SELECT graft_zorder(5L, 3L) AS a, graft_zorder(CAST(NULL AS BIGINT), 3L) AS b")
      .collect()
    assert(rows.head.getLong(0) == ZOrderNative.interleave(5, 3))
    assert(rows.head.isNullAt(1))
  }

  test("type check rejects non-bigint inputs") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_zorder('a', 1L)").collect()
    }
    assert(e.getMessage.contains("graft_zorder"), e.getMessage)
  }

  test("clusterByZ range-partitions by the z key with in-partition order") {
    val df = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val clustered = ZOrder.clusterByZ(df, col("x"), col("y"), 8)
    // each partition holds a contiguous, non-overlapping z-range
    val ranges = clustered
      .select(ZOrder.zorder(col("x"), col("y")).as("z"))
      .rdd.mapPartitionsWithIndex { (i, it) =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((i, zs.min, zs.max, zs == zs.sorted))
      }.collect().sortBy(_._1)
    assert(ranges.nonEmpty)
    assert(ranges.forall(_._4), "rows not sorted within a partition")
    ranges.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) => assert(max1 <= min2)
      case _ =>
    }
  }
}
