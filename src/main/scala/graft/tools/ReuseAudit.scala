package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints, per query, how many file scans and reused exchanges the
  * FINAL adaptive plan contains — the quick audit for "does this query
  * recompute a shared subtree or reuse its shuffle?".
  */
object ReuseAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // Execute df's OWN QueryExecution (a write action executes a
      // CLONED plan, leaving this one unexecuted with isFinalPlan =
      // false and meaningless reuse counts) — but through the RDD, not
      // collect(): a per-partition no-op drives the adaptive plan to
      // its final form without materializing wide text columns on the
      // driver, which at larger SFs would OOM the audit.
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      // the adaptive dump prints "initial" and "final" sections; take
      // the final (first) section only. Materialized stage subtrees
      // are collapsed in the dump, so count BOTH static ReusedExchange
      // nodes and repeated AQE stage ids (reuse under AQE shows as the
      // same QueryStage referenced more than once).
      val fin = plan.split("\\+\\- == Initial Plan ==").head
      val scans = "FileScan|Scan parquet".r.findAllIn(fin).size
      val stages = "(ShuffleQueryStage|BroadcastQueryStage) \\d+".r
        .findAllIn(fin).toSeq
      val reused = "ReusedExchange".r.findAllIn(fin).size +
        (stages.size - stages.distinct.size)
      println(f"AUDIT $n%-28s scans=$scans stages=${stages.size}%d reused=$reused")
    }
    spark.stop()
  }
}
