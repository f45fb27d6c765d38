package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Type-2 SCD history: interval semantics across two folds, and the
  * defining invariant — reconstructing any version from the history
  * returns exactly that version's snapshot.
  */
class Scd2Spec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  private def snap(rows: (Long, String)*): DataFrame =
    rows.toDF("id", "v")

  test("fold semantics: close on change/delete, open on change/insert") {
    val v1 = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val v2 = snap(1L -> "a", 2L -> "B", 4L -> "d") // 2 changed, 3 gone, 4 new
    val h = Merge.scd2Apply(Merge.scd2Init(v1, 1L), v2, "id", 2L)
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(h == Set(
      (1L, "a", 1L, None),     // untouched: still open from v1
      (2L, "b", 1L, Some(2L)), // old payload closed at v2
      (2L, "B", 2L, None),     // new payload open from v2
      (3L, "c", 1L, Some(2L)), // deleted: closed, nothing reopened
      (4L, "d", 2L, None)),    // inserted: open from v2
      h.toString)
  }

  test("NULL payload fields fold null-safely (no silently vanishing " +
      "rows)") {
    val v1 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "v")
    val v2 = Seq((1L, Some("x")), (2L, Option.empty[String]))
      .toDF("id", "v")
    val h = Merge.scd2Apply(Merge.scd2Init(v1, 1L), v2, "id", 2L)
      .as[(Long, Option[String], Long, Option[Long])].collect().toSet
    assert(h == Set(
      (1L, None, 1L, Some(2L)),     // null -> "x" is a CHANGE: closes
      (1L, Some("x"), 2L, None),
      (2L, None, 1L, None)),        // null -> null is UNCHANGED: open
      h.toString)
  }

  test("chained folds reconstruct every version exactly") {
    val v1 = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val v2 = snap(1L -> "a", 2L -> "B", 4L -> "d")
    val v3 = snap(2L -> "B", 3L -> "c2", 4L -> "d") // 1 gone, 3 back
    val h = Merge.scd2Apply(
      Merge.scd2Apply(Merge.scd2Init(v1, 1L), v2, "id", 2L),
      v3, "id", 3L)
    def rows(df: DataFrame): Set[(Long, String)] =
      df.as[(Long, String)].collect().toSet
    assert(rows(Merge.scd2AsOf(h, 1L)) == rows(v1))
    assert(rows(Merge.scd2AsOf(h, 2L)) == rows(v2))
    assert(rows(Merge.scd2AsOf(h, 3L)) == rows(v3))
  }
}
