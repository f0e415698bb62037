package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) operator — the multi-criteria "best
  * tradeoffs" query (Börzsönyi et al., ICDE'01, public): keep every row
  * no other row DOMINATES, where q dominates p iff q is ≤ p on the
  * minimized column, ≥ p on the maximized column, and strictly better on
  * at least one. The reference reaches this class of query through the
  * `--query` pass-through (`execute_sql.py:64,77`) as a NOT EXISTS
  * self-join — quadratic, and a cross-partition BNLJ on Spark. This
  * operator is the distributive two-phase form that survives 100 TB:
  *
  *   1. LOCAL PRUNE (map-side, one even pid-keyed exchange): within each
  *      input partition, sort by (min-col asc, max-col desc) and keep
  *      rows whose max-col value is ≥ the running max of all previous
  *      rows — every previous row has min-col ≤ current, so a smaller
  *      running max cannot hide a dominator. The filter can only
  *      over-admit (a true skyline point p with running-max > p.max
  *      would have an in-partition dominator — contradiction), so no
  *      skyline point is ever dropped; random data leaves O(log n)
  *      survivors per partition.
  *   2. GLOBAL VERIFY (exact, broadcast): the surviving candidate set is
  *      tiny, so the exact dominance anti-join runs candidates ×
  *      candidates under one broadcast — correct because dominance is a
  *      strict partial order and phase 1 only removes dominated rows:
  *      any dominator of a candidate is itself dominated by (or is) a
  *      surviving candidate, by transitivity. skyline(candidates) ==
  *      skyline(S), and the whole output hash-gates against the direct
  *      quadratic NOT EXISTS the oracle runs.
  *
  * All comparisons are integer/decimal exact — nothing floats — so the
  * gate is bit-for-bit. OpsSpec additionally pins the distributivity
  * contract (skyline of unioned partition skylines == skyline of the
  * whole) on a corpus split.
  */
object SkylineOps {

  /** Pareto frontier of `df` minimizing `minCol` and maximizing `maxCol`.
    * Emits the non-dominated rows of the two criteria columns plus the
    * `id` column, ordered by id. Duplicate (minCol, maxCol) points are
    * all kept — neither strictly dominates the other. */
  def skyline(df: DataFrame, id: String, minCol: String, maxCol: String): DataFrame = {
    val pts = df.selectExpr(s"$id as id", s"$minCol as mn", s"$maxCol as mx")
    // phase 1: per-partition running-max prune. Window keyed by the
    // physical partition id — an even, data-independent key, so the one
    // exchange it costs never skews; everything after is partition-local.
    val byPid = Window.partitionBy("pid")
      .orderBy(col("mn").asc, col("mx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cands = pts
      .withColumn("pid", spark_partition_id())
      .withColumn("rmax", max("mx").over(byPid))
      .filter(col("rmax").isNull || col("mx") >= col("rmax"))
      .select("id", "mn", "mx")
    // phase 2: exact dominance among the (small) candidate set — an
    // inequality anti-join Spark can only BNLJ, which is exactly right
    // here because the build side is the broadcast candidate set.
    val dom = broadcast(cands.selectExpr("mn as q_mn", "mx as q_mx"))
    cands.join(dom,
        col("q_mn") <= col("mn") && col("q_mx") >= col("mx") &&
          (col("q_mn") < col("mn") || col("q_mx") > col("mx")),
        "left_anti")
      .orderBy("id")
  }
}
