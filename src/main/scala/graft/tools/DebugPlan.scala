package graft.tools
import org.apache.spark.sql.SparkSession
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    args.drop(1).foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val fin = df.queryExecution.executedPlan.toString
        .split("\\+\\- == Initial Plan ==").head
      println(s"===== $n =====")
      println(fin)
    }
    spark.stop()
  }
}
