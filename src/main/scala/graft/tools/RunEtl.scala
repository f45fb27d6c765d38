package graft.tools

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession
import graft.config.EtlConfig
import graft.ops.ExtractJob

/** CLI entry mirroring the reference's `idnareaetl extract` command
  * (`cli.py:77-205`), minus PDF parsing: input is a cell-table parquet
  * at the post-camelot boundary (FIXTURES.md §1).
  *
  * Usage: RunEtl <cells.parquet> <destDir> <outputName> [config.toml]
  *
  * Without a config path, the reference's shipped `idnareaetl.toml`
  * defaults apply (suffixes province/regency/district/village/island,
  * standard headers).
  */
object RunEtl {

  /** Defaults matching `/root/reference/idnareaetl.toml`. */
  def defaultConfig: EtlConfig.Config = EtlConfig.Config(Map(
    "province" -> EtlConfig.DataConfig(500, Seq("code", "name"), "province"),
    "regency" -> EtlConfig.DataConfig(500,
      Seq("code", "province_code", "name"), "regency"),
    "district" -> EtlConfig.DataConfig(1000,
      Seq("code", "regency_code", "name"), "district"),
    "village" -> EtlConfig.DataConfig(2000,
      Seq("code", "district_code", "name"), "village"),
    "island" -> EtlConfig.DataConfig(1000,
      Seq("code", "regency_code", "coordinate", "is_populated",
        "is_outermost_small", "name"), "island")))

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: RunEtl <cells.parquet> <destDir> <outputName> [config.toml]")
      sys.exit(2)
    }
    val Array(input, dest, name) = args.take(3)
    val config =
      if (args.length >= 4) EtlConfig.load(Paths.get(args(3)))
      else defaultConfig

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    try {
      val cells = spark.read.parquet(input)
      val result = ExtractJob.run(cells, dest, name, config)
      val secs = (System.nanoTime() - t0) / 1e9
      // report shape follows `cli.py:196,203-205`
      println(s"Extraction completed in ${graft.ops.PageRange.formatDuration(secs)}")
      println(s"Total rows extracted: ${result.total}")
      result.counts.toSeq.sortBy(_._1).foreach { case (e, c) =>
        println(s"  $e: $c")
      }
      result.files.foreach(f => println(s"  -> $f"))
    } catch {
      case e: ExtractJob.NoMatchingDataException =>
        System.err.println(s"Error: ${e.message}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
