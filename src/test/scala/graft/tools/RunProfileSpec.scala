package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The data-card generator end-to-end on a hand-computed corpus:
  * every table it writes is a composition of already-spec-pinned
  * operator bodies, so this pins the COMPOSITION — table layout,
  * filters (dup groups only where dup_count > 1), and the headline
  * counters.
  */
class RunProfileSpec extends SparkSpec {
  import graft.SparkTestSession.spark.implicits._

  test("profile writes the five tables and the headline counters " +
      "match the hand-computed corpus") {
    val prose = "the data and the model go to the set with care " +
      "and the run ends today just fine over there again now."
    val docs = Seq(
      (1L, "en", prose),                  // good
      (2L, "en", prose),                  // exact dup of 1
      (3L, "en", "too short"),            // quality: too_short
      (4L, "de", prose + " caffÃ¨"),      // damaged (mojibake)
      (5L, "en", prose + " unique tail")) // good, unique
      .toDF("doc_id", "lang", "text")
    val dir = Files.createTempDirectory("graft-profile-").toString
    val (nDocs, nDamaged, nDups) =
      RunProfile.profile(spark, docs, dir)
    assert((nDocs, nDamaged, nDups) == ((5L, 1L, 1L)),
      s"($nDocs, $nDamaged, $nDups)")

    val quality = spark.read.parquet(s"$dir/quality")
      .as[(String, Long)].collect().toMap
    assert(quality.get("too_short").contains(1L), quality.toString)

    val dups = spark.read.parquet(s"$dir/dup_groups")
      .select("keep_doc_id", "dup_count")
      .as[(Long, Long)].collect().toSeq
    assert(dups == Seq((1L, 2L)), dups.toString)

    val win = spark.read.parquet(s"$dir/winsorized")
      .select(col("grp")).as[String].collect().toSet
    assert(win == Set("en", "de"), win.toString)

    assert(spark.read.parquet(s"$dir/corpus_report").count() >= 1L)
  }
}
