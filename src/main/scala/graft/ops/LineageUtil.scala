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

  /** Pin the exchange feeding an AMPLIFYING self-join to the session's
    * shuffle-partition count.
    *
    * A candidate-generation join whose OUTPUT is quadratic in the bucket
    * size while the INPUT rows are skinny is exactly the shape where
    * AQE's input-size-based partition coalescing is wrong: it folds the
    * few-MB exchange into one partition and the multi-million-pair
    * verification runs serially (the r12 op_simhash_pairs anomaly —
    * 8.7 → 15.6 s on unchanged code — was one task's scheduling luck;
    * pinning took it to 1.8 s min-of-3). A user-specified partition
    * count is exempt from AQE coalescing, and the join reuses this
    * exchange (same keys), so at cluster scale — where the exchange
    * would never be coalesced anyway — this costs nothing extra.
    *
    * Apply ONLY where the amplification factor is large (the pigeonhole
    * Hamming join: ~100× rows out per row in). The LSH band / AllPairs
    * prefix / cluster-bucket joins were measured WORSE with a pin
    * (+20–45% at sf0.1): their amplification is modest and the forced
    * exchange defeats the broadcast/pipelined plan AQE otherwise picks.
    */
  def pinJoinParallelism(df: DataFrame, keys: String*): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
      keys.map(df.col): _*)
}
