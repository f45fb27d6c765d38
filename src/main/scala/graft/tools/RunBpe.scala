package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.BpeMiner

/** Persisted BPE tokenizer lifecycle — the train-once / encode-many
  * counterpart of [[RunAnnIndex]]/[[RunDedupIndex]]: ONE train job
  * mines the merge table over the corpus vocabulary and writes it as
  * a parquet model; every later encode folds the loaded merges into a
  * literal replace chain, so the corpus plan is a pure scan with no
  * joins and no re-mining. This is what the in-query `bpe_*` family
  * deliberately is not: those re-mine per query because the driver's
  * correctness gate runs each query cold against fresh parquet.
  *
  * Usage:
  *   RunBpe train  <docs.parquet> <modelDir> [rounds]
  *   RunBpe encode <docs.parquet> <modelDir> <outDir>
  *   RunBpe stats  <docs.parquet> <modelDir>
  *
  * Layout under `modelDir`:
  *   merges/  (merge_rank, l, r, pair_cnt) — raw placeholder-bearing
  *            symbols ([[BpeMiner.rawMerges]]); rank order replays
  *            the trainer exactly
  *
  * `stats` prints one JSON line (n_docs, total_tokens, n_merges) —
  * the fertility numerator a tokenizer owner tracks across model
  * versions.
  */
object RunBpe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    args.toList match {
      case "train" :: docs :: modelDir :: rest =>
        val rounds = rest.headOption.map(_.toInt).getOrElse(16)
        BpeMiner.rawMerges(spark.read.parquet(docs), rounds)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$modelDir/merges")
      case "encode" :: docs :: modelDir :: outDir :: Nil =>
        BpeMiner.encodeWithMerges(
            spark.read.parquet(docs),
            spark.read.parquet(s"$modelDir/merges"))
          .write.mode("overwrite").parquet(outDir)
      case "stats" :: docs :: modelDir :: Nil =>
        val merges = spark.read.parquet(s"$modelDir/merges")
        val nMerges = merges.count()
        val row = BpeMiner.encodeWithMerges(
            spark.read.parquet(docs), merges)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          .head()
        // scalastyle:off println
        println(s"""{"n_docs": ${row.getLong(0)}, """ +
          s""""total_tokens": ${row.getLong(1)}, """ +
          s""""n_merges": $nMerges}""")
        // scalastyle:on println
      case other =>
        System.err.println(
          "usage: RunBpe train <docs> <modelDir> [rounds] | " +
            "encode <docs> <modelDir> <outDir> | " +
            s"stats <docs> <modelDir> (got: ${other.mkString(" ")})")
        sys.exit(2)
    }
  }
}
