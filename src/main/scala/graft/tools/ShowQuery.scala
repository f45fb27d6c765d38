package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Runs selected SparkEntry queries and prints their results — the
  * quick inspection loop for iterating on a query or its oracle.
  *
  * Usage: ShowQuery <sfDir> <queryName> [queryName ...]
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShowQuery <sfDir> <query> [query ...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    args.drop(1).foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).show(50, truncate = false)
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
