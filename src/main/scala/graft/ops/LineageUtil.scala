package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block cleanup for iterative round loops (PageRank, k-core, BPE).
  *
  * `Dataset.unpersist` is a NO-OP on a `localCheckpoint()`-ed DataFrame:
  * the checkpoint materializes RDD blocks outside the Dataset cache
  * manager, so the loops that re-checkpoint a node/edge-sized vector per
  * round were keeping EVERY round's blocks alive until GC/ContextCleaner
  * (ADVICE r11). [[freeLocalCheckpoint]] unpersists the underlying
  * checkpointed RDD itself, releasing the blocks eagerly.
  *
  * Irreversibility contract: a local checkpoint truncates lineage, so a
  * freed DataFrame can never be recomputed — callers free only the
  * PREVIOUS round's frame, strictly after the next round's EAGER
  * checkpoint has materialized (every call site in this repo follows
  * that order).
  */
private[graft] object LineageUtil {
  def freeLocalCheckpoint(df: DataFrame): Unit = df.queryExecution.logical match {
    case r: LogicalRDD => r.rdd.unpersist(blocking = false)
    // not a checkpoint scan (e.g. the still-persist()-ed round 0): the
    // ordinary cache-manager path applies
    case _ => df.unpersist()
  }
}
