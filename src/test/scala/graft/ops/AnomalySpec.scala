package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed anomaly-detector pins: EWMA weights and history
  * gating, observation indexing across gaps, the leave-one-out
  * seasonal baseline and its small-slot guard.
  */
class AnomalySpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  /** Events at 1 µs bucket size so bucket == ts. */
  private def ev(pairs: (Long, Long)*) = // (bucket, howMany)
    pairs.flatMap { case (b, k) => Seq.fill(k.toInt)(("A", b)) }
      .toDF("event_type", "ts")

  test("ewmaSpikes: weighted history, gated until 8 observations") {
    // counts 1,1,1,1,1,1,1,1 then 3: ewma_num = 255 (all-ones),
    // spike iff 3·255 > 2·255 → true; every earlier bucket has
    // incomplete history → ewma_num null, never flagged
    val df = Anomaly.ewmaSpikes(
      ev((1L to 8L).map(b => (b, 1L)) :+ (9L, 3L): _*), bucketUs = 1L)
    val rows = df.orderBy("bucket")
      .select(col("bucket"), col("cnt"), col("ewma_num"), col("is_spike"))
      .collect()
    assert(rows.take(8).forall(r => r.isNullAt(2) && !r.getBoolean(3)))
    val last = rows.last
    assert((last.getLong(0), last.getLong(1), last.getLong(2),
      last.getBoolean(3)) == ((9L, 3L, 255L, true)), last.toString)
  }

  test("ewmaSpikes: a flat series never flags (equality is not a spike)") {
    val df = Anomaly.ewmaSpikes(
      ev((1L to 12L).map(b => (b, 2L)): _*), bucketUs = 1L)
    assert(df.filter(col("is_spike")).count() == 0)
  }

  test("ewmaSpikes is observation-indexed: gaps advance to observed buckets") {
    // buckets 1..8 present, 9-19 missing, 20 = 3: the window is the
    // previous 8 OBSERVED buckets, so bucket 20 still sees 255
    val df = Anomaly.ewmaSpikes(
      ev((1L to 8L).map(b => (b, 1L)) :+ (20L, 3L): _*), bucketUs = 1L)
    val r = df.filter(col("bucket") === 20L).collect().head
    assert(r.getLong(r.fieldIndex("ewma_num")) == 255L)
    assert(r.getBoolean(r.fieldIndex("is_spike")))
  }

  test("seasonalSpikes: leave-one-out slot mean, cross-multiplied") {
    // slot 1 (mod 24): buckets 1, 25, 49 with counts 2, 2, 9.
    // bucket 49: base = (4, 2) → 9·2 > 2·4 → spike.
    // bucket 1: base = (11, 2) → 2·2 > 2·11 false.
    val df = Anomaly.seasonalSpikes(
      ev((1L, 2L), (25L, 2L), (49L, 9L)), bucketUs = 1L)
    val got = df.select(col("bucket"), col("base_cnt"), col("base_n"),
        col("is_spike"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 11L, 2L, false), (25L, 11L, 2L, false),
      (49L, 4L, 2L, true)), got.toString)
  }

  test("seasonalSpikes: a slot with no other observation never flags") {
    val df = Anomaly.seasonalSpikes(ev((3L, 100L)), bucketUs = 1L)
    val r = df.collect().head
    assert(r.getLong(r.fieldIndex("base_n")) == 0L)
    assert(!r.getBoolean(r.fieldIndex("is_spike")))
  }
}
