package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{EventOps, Scc}

/** Data-scaled stress evidence for the SCC/condensation/bowtie family
  * (VERDICT r17 missing #4): run the graph operators over the
  * events-derived [[EventOps.segmentCycleGraph]] — whose node/edge
  * counts grow with the scale factor and whose peel depth is the `q`
  * dial — and print one JSON line per q with the measured outer
  * rounds (which must equal q by construction) and warm wall times.
  *
  * Usage: RunGraphScale <events.parquet> <q,q,...>
  */
object RunGraphScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val (eventsPath, qs) = args.toList match {
      case p :: q :: Nil => (p, q.split(",").map(_.trim.toInt).toSeq)
      case other =>
        System.err.println("usage: RunGraphScale <events.parquet> " +
          s"<q,q,...> (got: ${other.mkString(" ")})")
        sys.exit(2)
        throw new IllegalStateException("unreachable")
    }
    val events = spark.read.parquet(eventsPath).cache()
    events.write.format("noop").mode("overwrite").save()
    var warmed = false
    qs.foreach { q =>
      val edges = EventOps.segmentCycleGraph(events, q)
        .localCheckpoint()
      val nEdges = edges.count()
      val nNodes = edges.selectExpr("src AS n").union(
        edges.selectExpr("dst")).distinct().count()
      def sccRun(): (Long, Scc.SccStats, Double) = {
        val t0 = System.nanoTime()
        val (labels, stats) =
          Scc.stronglyConnectedWithStats(edges, maxOuter = q + 2,
            maxInner = 256)
        val nSccs = labels.select(countDistinct(col("scc_id"))).head()
          .getLong(0)
        graft.ops.CheckpointUtil.free(labels)
        (nSccs, stats, (System.nanoTime() - t0) / 1e9)
      }
      if (!warmed) { sccRun(); warmed = true } // JIT/codegen warm once
      val (nSccs, stats, sccS) = sccRun()
      val t1 = System.nanoTime()
      val cond = Scc.condensation(edges, maxOuter = q + 2,
        maxInner = 256, maxDepth = 4 * q + 8)
      val maxLayer = cond.agg(max(col("layer"))).head().getLong(0)
      graft.ops.CheckpointUtil.free(cond)
      val condS = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val bt = Scc.bowtie(edges, maxOuter = q + 2, maxInner = 256,
        maxDepth = 4 * q + 8)
      bt.write.format("noop").mode("overwrite").save()
      val btS = (System.nanoTime() - t2) / 1e9
      // scalastyle:off println
      println(f"""{"q": $q, "nodes": $nNodes, "edges": $nEdges, """ +
        f""""n_sccs": $nSccs, "outer_rounds": ${stats.outerRounds}, """ +
        f""""trim_layers": ${stats.trimLayers}, """ +
        f""""peel_rounds": ${stats.peelRounds}, """ +
        f""""max_layer": $maxLayer, """ +
        f""""scc_s": $sccS%.2f, "cond_s": $condS%.2f, """ +
        f""""bowtie_s": $btS%.2f}""")
      // scalastyle:on println
      graft.ops.CheckpointUtil.free(edges)
    }
    spark.stop()
  }
}
