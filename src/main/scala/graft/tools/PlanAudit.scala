package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Prints `explain("formatted")` for selected SparkEntry queries so
  * plan properties (pushed filters, read schemas, broadcast joins,
  * whole-stage codegen spans, exchange reuse) can be audited per round.
  *
  * Usage: PlanAudit <sfDir> [queryName ...]   (default: headline set)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("s3_page_prune", "agg_groupby", "j1_ri_antijoin",
        "dedup_exact_groups", "minhash_planted_recall", "ann_lsh_topk")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same session shape as Verify/Bench: graft SQL functions + the
    // FuseHofDotProduct / RewriteRangeJoin optimizer rules installed
    graft.GraftExtensions.register(spark)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
