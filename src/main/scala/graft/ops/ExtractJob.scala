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
  * S7 multi-sink fan-out: BOTH extracted frames (area-tagged, island)
  * are cached once; the five entity projections write from the caches —
  * one scan of the cell input per extract family, five cheap filtered
  * writes (entities have different schemas, so separate writes, per
  * SURVEY §2.1).
  *
  * Row counts (A2's count accumulation) are taken AFTER each write,
  * from the already-populated cache: the count job reads memory, not
  * the source, so the extract pipelines execute exactly once. (A
  * `Dataset.observe` metric was tried and rejected: the ordered write's
  * range-partitioner sampling pass evaluates the plan a second time and
  * double-counts the metric.)
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
      // Scale-safe default: range-partitioned multi-file output (no
      // single-task total-sort drain). Pass singleFile=true explicitly
      // for reference-parity one-file-per-entity layout (the CLI does).
      singleFile: Boolean = false): Result = {
    val (area, island) = Dispatch.extractAll(cells)
    val areaCached = area.cache()
    val islandCached = island.cache()
    try {
      val entityFrames: Seq[(String, DataFrame)] =
        Seq("province", "regency", "district", "village")
          .map(e => e -> AreaPipeline.entity(areaCached, e)) :+
          // flags stay Int here; CsvSink casts every column to string
          // at write (matching the reference's stringify-at-serialize)
          ("island" -> islandCached)

      val written = entityFrames.map { case (entityName, df) =>
        val cfg = config.data.getOrElse(entityName,
          throw EtlConfig.ConfigError(
            s"Missing or invalid configuration for area '$entityName'"))
        val headers = cfg.outputHeaders
        val dataCols = df.columns.filterNot(_ == "seq")
        if (headers.length != dataCols.length)
          throw EtlConfig.ConfigError(
            s"header arity mismatch for $entityName: " +
              s"$headers vs ${dataCols.toSeq}")
        val renamed = df.select(
          (dataCols.zip(headers).map { case (c, h) => col(c).as(h) } :+
            col("seq")).toIndexedSeq: _*)
        val path = CsvSink.write(renamed, destination, outputName,
          cfg.filenameSuffix, singleFile)
        // cache is hot after the write; this count never hits the source
        (entityName, renamed.count(), path)
      }

      val counts = written.map { case (e, c, _) => e -> c }.toMap
      if (counts.values.sum == 0)
        throw NoMatchingDataException("No matching data found")
      Result(counts, written.map(_._3))
    } finally {
      areaCached.unpersist()
      islandCached.unpersist()
    }
  }
}
