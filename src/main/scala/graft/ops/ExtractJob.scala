package graft.ops

import java.nio.file.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.EtlConfig
import graft.io.CsvSink

/** The whole-pipeline driver (`cli.py:77-205` `extract` minus PDF
  * parsing): dispatch cell tables to the two extractor families, write
  * the five entity CSVs in document order, fail on zero rows (A2,
  * `cli.py:198-201`).
  *
  * S7 multi-sink fan-out: the tagged area frame is cached once and four
  * entity projections write from it — one pass over the input, four
  * cheap filtered writes (entities have different schemas, so separate
  * writes, per SURVEY §2.1).
  */
object ExtractJob {

  final case class Result(counts: Map[String, Long], files: Seq[Path]) {
    def total: Long = counts.values.sum
  }

  /** Raised when the whole run extracted zero rows
    * ("No matching data found" — `cli.py:198-201`).
    */
  final case class NoMatchingDataException(message: String)
      extends RuntimeException(message)

  def run(
      cells: DataFrame,
      destination: String,
      outputName: String,
      config: EtlConfig.Config,
      singleFile: Boolean = true): Result = {
    val (area, island) = Dispatch.extractAll(cells)
    val areaCached = area.cache()
    try {
      val entityFrames: Seq[(String, DataFrame)] =
        Seq("province", "regency", "district", "village")
          .map(e => e -> AreaPipeline.entity(areaCached, e)) :+
          ("island" -> island.withColumn("is_populated",
            col("is_populated").cast("string"))
            .withColumn("is_outermost_small",
              col("is_outermost_small").cast("string")))

      val written = entityFrames.map { case (entityName, df) =>
        val cfg = config.data.getOrElse(entityName,
          throw EtlConfig.ConfigError(
            s"Missing or invalid configuration for area '$entityName'"))
        val headers = cfg.outputHeaders
        val dataCols = df.columns.filterNot(_ == "seq")
        require(headers.length == dataCols.length,
          s"header arity mismatch for $entityName: $headers vs ${dataCols.toSeq}")
        val renamed = df.select(
          dataCols.zip(headers).map { case (c, h) => col(c).as(h) } :+
            col("seq"): _*)
        val count = renamed.count() - 0L
        val path = CsvSink.write(renamed, destination, outputName,
          cfg.filenameSuffix, singleFile)
        (entityName, count, path)
      }

      val counts = written.map { case (e, c, _) => e -> c }.toMap
      if (counts.values.sum == 0)
        throw NoMatchingDataException("No matching data found")
      Result(counts, written.map(_._3))
    } finally areaCached.unpersist()
  }
}
