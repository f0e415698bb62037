package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins on hot keys.
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * sort-merge partitions at runtime; explicit salting is the complement
  * for when the layout must be fixed up front — iterative jobs that reuse
  * the exchange, plans AQE can't rewrite, or engines where a single hot
  * key would otherwise pin one task at 100 TB while the cluster idles.
  */
object SkewOps {

  /** Equi-join with the big side's hot keys spread over `salt` shuffle
    * partitions: the big side gets a per-row salt, the small side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — so one hot key fans out across `salt` tasks instead of
    * one. Cost: `salt`× duplication of the SMALL side only.
    *
    * Only big-side-preserving join types are supported: for those the
    * result is row-for-row identical to `big.join(small, Seq(key),
    * joinType)`. Right/full (and right-semi/anti) variants would emit each
    * UNMATCHED small-side row `salt` times — one per replica — so they are
    * rejected up front rather than silently corrupted.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigPreserving =
      Set("inner", "cross", "left", "left_outer", "left_semi", "left_anti")
    require(bigPreserving.contains(joinType.toLowerCase.replace("outer", "_outer")
        .replace("semi", "_semi").replace("anti", "_anti").replace("__", "_")),
      s"saltedJoin: join type '$joinType' is not big-side-preserving — " +
        "unmatched small-side rows would appear once per salt replica")
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
