package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.io.CsvSink
import graft.streaming.StreamingExtract

/** Streaming CLI entry: tail a directory of cell-table parquet files
  * (the post-camelot boundary) and append per-entity CSV output as new
  * chunks arrive — the reference's chunk loop (`cli.py:170-194`) as a
  * Structured Streaming job.
  *
  * Usage: RunStreamEtl <cellsDir> <destDir> <outputName> [checkpointDir]
  *
  * Runs with `Trigger.AvailableNow`: processes the current backlog then
  * exits (re-run to pick up new files; the checkpoint makes that
  * exactly-once). Each entity batch is written as a per-batch CSV
  * directory — appends never rewrite prior output.
  */
object RunStreamEtl {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: RunStreamEtl <cellsDir> <destDir> <outputName> [checkpointDir]")
      sys.exit(2)
    }
    val Array(input, dest, name) = args.take(3)
    val ckpt =
      if (args.length >= 4) args(3)
      else Files.createTempDirectory("graft-stream-ckpt-").toString

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-stream-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val counts = scala.collection.concurrent.TrieMap.empty[String, Long]
    val q = StreamingExtract.run(
      StreamingExtract.readCells(spark, input),
      ckpt,
      (batchId, entity, df) => {
        val n = df.count()
        counts.updateWith(entity)(c => Some(c.getOrElse(0L) + n))
        if (n > 0) {
          // keyed by the CHECKPOINTED batch id: re-runs continue the
          // sequence instead of overwriting a previous run's output
          CsvSink.write(df, Paths.get(dest, s"batch_$batchId").toString,
            name, entity, singleFile = false)
        }
        ()
      })
    q.awaitTermination()

    println(s"Streaming backlog processed; checkpoint: $ckpt")
    counts.toSeq.sortBy(_._1).foreach { case (e, c) => println(s"  $e: $c") }
    spark.stop()
  }
}
