package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Microbenchmark: native codegen'd cosine (CosineSimExpr) vs the
  * composed higher-order-function formulation, on a cached in-memory
  * frame so only expression evaluation is timed. Run with
  * `sbt "runMain graft.tools.MicroBench [rows]"`.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = 64
    val vec = (salt: Int) => transform(sequence(lit(0), lit(dims - 1)),
      j => (pmod(col("id") * 31 + j * salt, lit(997)).cast("float") / 997f))
    val df = spark.range(rows)
      .select(col("id"), vec(7).as("a"), vec(13).as("b"))
      .cache()
    df.count() // materialize outside the timed region

    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      // warm once (JIT/codegen), then time
      df.select(sum(c)).collect()
      val t0 = System.nanoTime()
      df.select(sum(c)).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-8s $sec%8.3f s  (${rows / sec / 1e6}%6.2f M rows/s)")
      sec
    }

    val hof = time("hof", Similarity.cosineHof(col("a"), col("b")))
    val native = time("native", Similarity.cosine(col("a"), col("b")))
    println(f"speedup ${hof / native}%.1fx")
    spark.stop()
  }
}
