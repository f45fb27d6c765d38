package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle management for `localCheckpoint()` frames inside iterative
  * operators (components, k-core, PageRank, LPA, k-means, PQ training).
  *
  * `localCheckpoint` pins its blocks in storage memory for the LIFETIME
  * of the session — nothing ever unpersists them implicitly. A
  * BSP-style loop that checkpoints per round therefore leaks one
  * superseded block set per round: harmless in a one-query session,
  * but in a long-lived session (the 188-query bench, or any real
  * cluster running many jobs) dozens of dead checkpoints crowd storage
  * memory until executors spill and every later job pays for it — the
  * r15 driver bench measured `neardup_components` at 6-8× its
  * quiet-session cost from exactly this accumulation.
  *
  * The contract: once round N's checkpoint has MATERIALIZED (its
  * creating action completed — eager checkpoints materialize at the
  * call; lazy ones at their first action), round N−1's blocks can be
  * freed, because N's lineage was truncated AT its own blocks and
  * never reaches back. Operators keep only the frames still reachable
  * from the value they return (their consumers compute from those
  * blocks) — callers that are themselves done with the RESULT can
  * [[free]] it too.
  */
object CheckpointUtil {

  /** Unpersist (non-blocking) every locally-checkpointed RDD appearing
    * as a leaf in the given frames' analyzed plans.
    *
    * Ownership contract: only call this on frames whose EVERY
    * checkpoint leaf you created — a frame derived from a
    * caller-supplied checkpoint would have the caller's blocks freed
    * out from under it (a locally-checkpointed RDD cannot recompute:
    * its lineage is gone). Inside this repo's operators that means:
    * superseded per-round state, and operator-internal scaffolding
    * (edge/adjacency frames) once the loop exits; never a frame passed
    * in as an argument.
    */
  def free(dfs: DataFrame*): Unit =
    dfs.iterator.filter(_ != null).foreach { df =>
      df.queryExecution.analyzed.collect {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      }
    }
}
