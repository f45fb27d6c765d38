package graft.tools

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared crash-safe table-replace for the persisted index lifecycles
  * ([[RunDedupIndex]], [[RunAnnIndex]]): write the replacement to a
  * sibling temp dir, then swap via two `FileSystem.rename`s through a
  * `.old` name. Runs on the Hadoop FileSystem API so the same code
  * drives a local checkout and an HDFS-resident index. A crash at any
  * point leaves either the old or the new table reachable: if a
  * previous run died between its two renames (live name missing,
  * `.old` present), the next call restores the live name BEFORE
  * reading or writing anything. CAVEAT: object stores without atomic
  * rename (S3A renames by copy+delete) make the two-rename protocol
  * non-atomic — front an S3-resident index with a manifest/table
  * format, or compact via an HDFS scratch and promote.
  */
object IndexUtil {

  def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** If `live` is missing but `live.old` exists (a previous swap died
    * between its two renames), restore it. Call before reading a
    * swap-managed table outside [[replaceDir]].
    */
  def healTorn(spark: SparkSession, live: String): Unit = {
    val (fs, livePath) = fsFor(spark, live)
    val old = new Path(live + ".old")
    if (!fs.exists(livePath) && fs.exists(old))
      require(fs.rename(old, livePath),
        s"could not restore $live from $old")
  }

  /** Replace the directory `live` with whatever `writeTmp` writes to
    * the temp path it is given. Self-heals a torn previous swap first;
    * stranded `.old`/temp leftovers from crashed runs are cleared.
    */
  def replaceDir(spark: SparkSession, live: String)(
      writeTmp: String => Unit): Unit = {
    val (fs, livePath) = fsFor(spark, live)
    val old = new Path(live + ".old")
    val name = livePath.getName
    val tmp = new Path(livePath.getParent, s".$name.compact")
    healTorn(spark, live)
    if (fs.exists(old)) fs.delete(old, true) // post-swap leftover
    if (fs.exists(tmp)) fs.delete(tmp, true) // half-written rewrite
    writeTmp(tmp.toString)
    require(fs.rename(livePath, old), s"rename $livePath -> $old failed")
    require(fs.rename(tmp, livePath), s"rename $tmp -> $livePath failed")
    fs.delete(old, true)
  }
}
