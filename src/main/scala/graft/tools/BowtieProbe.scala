package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Scc

/** Scratch phase-timing probe for bowtie_regions (r20 adjudication). */
object BowtieProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def edges = {
      val nd = spark.read.parquet(s"$dir/customer.parquet")
        .select((col("c_custkey") % 150).as("v")).distinct()
      val core = nd.filter(col("v") < 60)
        .select(col("v").as("src"), ((col("v") + 7) % 60).as("dst"))
      val inT = nd.filter(col("v") >= 60 && col("v") < 100)
        .select(col("v").as("src"), (col("v") - 60).as("dst"))
      val outT = nd.filter(col("v") >= 100 && col("v") < 140)
        .select((col("v") - 100).as("src"), col("v").as("dst"))
      val isl = nd.filter(col("v") >= 140)
        .select(col("v").as("src"),
          (lit(140) + ((col("v") - 140 + 1) % 10)).as("dst"))
      core.unionByName(inT).unionByName(outT).unionByName(isl)
    }
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      // scalastyle:off println
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // scalastyle:on println
      out
    }
    // warm
    t("warm full bowtie")(Scc.bowtie(edges).count())
    t("warm2 full bowtie")(Scc.bowtie(edges).count())
    val l = t("stronglyConnected")(Scc.stronglyConnected(edges))
    t("labels count")(l.count())
    t("full bowtie")(Scc.bowtie(edges).count())
    graft.ops.CheckpointUtil.free(l)
    spark.stop()
  }
}
