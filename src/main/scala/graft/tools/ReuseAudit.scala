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
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      // the adaptive dump prints "initial" and "final" sections; take
      // the final (first) section only
      val fin = plan.split("\\+\\- == Initial Plan ==").head
      val scans = "FileScan|Scan parquet".r.findAllIn(fin).size
      val reused = "ReusedExchange".r.findAllIn(fin).size
      println(f"AUDIT $n%-28s scans=$scans reused=$reused")
    }
    spark.stop()
  }
}
