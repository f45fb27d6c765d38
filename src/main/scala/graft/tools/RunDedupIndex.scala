package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextDedup

/** Persisted near-dup index lifecycle — the operational form of
  * [[graft.ops.TextDedup.incrementalNearNew]]: a weekly 100 TB crawl
  * builds the MinHash band + shingle-signature index ONCE, then every
  * later snapshot runs against the parquet index without ever
  * re-shingling the prior corpus.
  *
  * Usage:
  *   RunDedupIndex build <corpus.parquet> <indexDir>
  *   RunDedupIndex apply <new.parquet> <indexDir> <outDir>
  *                 [--threshold P] [--update]
  *
  * `build` writes `indexDir/band_index` (doc_id, band_idx, band_hash)
  * and `indexDir/shingle_index` (doc_id, sh) — ~12 bytes/band-row and
  * one sorted long array per doc; both partitioned by parquet's
  * defaults so a later `apply` prunes on the band equi-join key.
  *
  * `apply` keeps the rows of the new snapshot with no verified
  * near-duplicate in the index (Jaccard >= P%, default 80) and writes
  * them to `outDir`. With `--update` the SURVIVORS' bands and shingles
  * are appended to the index afterwards, so the next snapshot also
  * dedups against this one. The append is computed from the
  * materialized `outDir` parquet — never from a plan that still reads
  * the index — so the index directory is never read and written by the
  * same job (self-overwrite hazard), and a crash between the survivor
  * write and the index append leaves a usable index (merely missing
  * this snapshot, which a re-run repairs idempotently by re-applying).
  *
  * Scale shape (see `IncrementalNearDupSpec` for the pins): only the
  * new slice — a few percent of the corpus — is shingled; the prior
  * corpus participates purely through the index join on a 12-byte band
  * key, with the `maxBucket` guard dropping boilerplate buckets that
  * collide every crawl before they can go quadratic.
  */
object RunDedupIndex {

  private val Usage =
    "usage: RunDedupIndex build <corpus.parquet> <indexDir>\n" +
      "       RunDedupIndex apply <new.parquet> <indexDir> <outDir> " +
      "[--threshold P] [--update]\n" +
      "       RunDedupIndex compact <indexDir> [numFiles]"

  /** Write the band + shingle index for `corpus` under `indexDir`. */
  def buildIndex(corpus: DataFrame, indexDir: String): Unit = {
    val (bands, sigs) = TextDedup.nearDupIndex(corpus)
    bands.write.mode("overwrite").parquet(s"$indexDir/band_index")
    sigs.write.mode("overwrite").parquet(s"$indexDir/shingle_index")
  }

  /** The survivors of `newDocs` against the persisted index, as a lazy
    * frame — the plan reads ONLY the two index tables and `newDocs`,
    * never the corpus the index was built from (spec-pinned).
    */
  def applyFrame(
      spark: SparkSession,
      newDocs: DataFrame,
      indexDir: String,
      thresholdPct: Int = 80): DataFrame =
    TextDedup.incrementalNearNew(newDocs,
      spark.read.parquet(s"$indexDir/band_index"),
      spark.read.parquet(s"$indexDir/shingle_index"),
      thresholdPct = thresholdPct)

  /** Append the bands + shingles of the docs at `survivorsPath` to the
    * index. Reads the MATERIALIZED survivors parquet (not a live plan
    * over the index) so the append never self-references the paths it
    * writes.
    */
  def updateIndex(
      spark: SparkSession,
      survivorsPath: String,
      indexDir: String): Unit = {
    val docs = spark.read.parquet(survivorsPath)
    val (bands, sigs) = TextDedup.nearDupIndex(docs)
    bands.write.mode("append").parquet(s"$indexDir/band_index")
    sigs.write.mode("append").parquet(s"$indexDir/shingle_index")
  }

  /** Compact the index in place: every weekly `--update` appends a
    * few files, and after months the band table is thousands of small
    * parquet files — the classic streaming-sink pathology, here on a
    * batch cadence. Rewrites each index table into `numFiles` files
    * sorted by its join key (band buckets / doc ids), which both
    * shrinks the file listing the next `apply` plans over and lets
    * sorted band buckets compress tightly. The rewrite goes to a
    * sibling temp dir first and swaps via two directory renames, so a
    * crash at any point leaves either the old or the new index intact
    * — never a half-written one (the stranded temp/old dir is cleaned
    * by the next compact).
    */
  def compactIndex(
      spark: SparkSession,
      indexDir: String,
      numFiles: Int = 8): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    import java.nio.file.{Files, Paths}
    def swap(live: String, tmp: String): Unit = {
      val old = Paths.get(live + ".old")
      if (Files.exists(old)) {
        // stranded by a previous crash — remove before reusing the name
        Files.walk(old).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      Files.move(Paths.get(live), old)
      Files.move(Paths.get(tmp), Paths.get(live))
      Files.walk(old).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    def rewrite(table: String, sortCols: Seq[String]): Unit = {
      val live = s"$indexDir/$table"
      val tmp = s"$indexDir/.$table.compact"
      spark.read.parquet(live)
        .repartition(numFiles)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      swap(live, tmp)
    }
    rewrite("band_index", Seq("band_idx", "band_hash"))
    rewrite("shingle_index", Seq("doc_id"))
  }

  /** One `apply` run: dedup `newDocs` against the index, write the
    * survivors to `outDir`, optionally fold them into the index.
    */
  def applyRun(
      spark: SparkSession,
      newDocsPath: String,
      indexDir: String,
      outDir: String,
      thresholdPct: Int = 80,
      update: Boolean = false): Long = {
    val kept = applyFrame(spark, spark.read.parquet(newDocsPath),
      indexDir, thresholdPct)
    kept.write.mode("overwrite").parquet(outDir)
    if (update) updateIndex(spark, outDir, indexDir)
    spark.read.parquet(outDir).count()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3) { System.err.println(Usage); sys.exit(2) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args(0) match {
      case "build" =>
        buildIndex(spark.read.parquet(args(1)), args(2))
        println(s"""{"built":"${args(2)}"}""")
      case "compact" =>
        compactIndex(spark, args(1),
          numFiles = args.lift(2).map(_.toInt).getOrElse(8))
        println(s"""{"compacted":"${args(1)}"}""")
      case "apply" =>
        if (args.length < 4) { System.err.println(Usage); sys.exit(2) }
        val rest = args.drop(4)
        val threshold = rest.sliding(2).collectFirst {
          case Array("--threshold", p) => p.toInt
        }.getOrElse(80)
        val n = applyRun(spark, args(1), args(2), args(3), threshold,
          update = rest.contains("--update"))
        println(s"""{"kept":$n,"threshold":$threshold}""")
      case other =>
        System.err.println(s"unknown mode '$other'\n$Usage"); sys.exit(2)
    } finally spark.stop()
  }
}
