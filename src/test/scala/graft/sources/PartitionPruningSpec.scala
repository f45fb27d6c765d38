package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition pruning on a hive-layout sink: the write-side
  * `partitionBy` and the read-side filter must meet at the scan — a
  * predicate on the partition column becomes a PartitionFilter that
  * prunes DIRECTORIES at planning time, so a 100 TB corpus laid out by
  * e.g. crawl date or language reads only the slices a query names.
  * (The z-order / bucketing layout levers are pinned elsewhere; this
  * pins the plainest and most load-bearing one.)
  */
class PartitionPruningSpec extends SparkSpec {

  test("a partition-column filter prunes directories, not just rows") {
    val dir = Files.createTempDirectory("graft-pp-").toString
    val ev = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val types = ev.select("event_type").distinct().count()
    assert(types >= 3, s"fixture needs several partitions, got $types")

    val all = spark.read.parquet(dir)
    val one = all.filter(col("event_type") === "purchase")
    val scan = one.queryExecution.executedPlan
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in the plan"))
    // the predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated per row after reading everything
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"partition filter missing: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.toString.contains("event_type")),
      s"event_type leaked into data filters: ${scan.dataFilters}")
    // and it actually pruned: the selected partition count is 1 of N
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got " +
        s"${scan.selectedPartitions.partitionCount}")
    // correctness unchanged by the layout
    assert(one.count() ==
      ev.filter(col("event_type") === "purchase").count())
  }
}
