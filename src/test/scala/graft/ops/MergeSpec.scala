package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge operators: apply/diff roundtrip recovers the change set,
  * identical snapshots diff empty, and null payloads compare sanely.
  */
class MergeSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "v").repartition(2)

  private def changes = Seq(
    (2L, "b", 99.0, "U"),   // update
    (3L, "c", 30.0, "D"),   // delete
    (9L, "z", 1.0, "I"))    // insert
    .toDF("k", "name", "v", "op")

  test("applyChanges produces the next snapshot") {
    val next = Merge.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(next == Set(
      (1L, "a", 10.0), (4L, "d", 40.0),  // untouched
      (2L, "b", 99.0),                   // updated
      (9L, "z", 1.0)))                   // inserted; 3 deleted
  }

  test("diff(base, applyChanges(base, cs)) recovers the change ops") {
    val next = Merge.applyChanges(base, changes, "k")
    val got = Merge.diff(base, next, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "U", 3L -> "D", 9L -> "I"))
  }

  test("identical snapshots diff to nothing") {
    assert(Merge.diff(base, base, "k").isEmpty)
  }

  test("a no-op update (identical payload) emits no diff row") {
    val noop = Seq((2L, "b", 20.0, "U")).toDF("k", "name", "v", "op")
    val next = Merge.applyChanges(base, noop, "k")
    assert(Merge.diff(base, next, "k").isEmpty)
  }

  test("null payload columns: null->value and value->null are updates") {
    val b = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("k", "name")
    val a = Seq((1L, None: Option[String]), (2L, Some("x")), (3L, Some("c")))
      .toDF("k", "name")
    val got = Merge.diff(b, a, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "U", 2L -> "U"))
  }
}
