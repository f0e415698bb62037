package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join: for every left row, the most recent right
  * timestamp at or before the left row's timestamp, per key — the standard
  * event-enrichment primitive (last quote before a trade, last view before
  * a click).
  *
  * Spark-first design: NOT a range join (a `l.ts >= r.ts` theta join
  * explodes into BroadcastNestedLoop and O(|L|·|R|) pairs per key). Both
  * sides are unioned, tagged, and scanned once under a per-key window
  * ordered by (ts, side): `last(right_ts, ignoreNulls)` over the running
  * frame yields the as-of match in ONE shuffle by key — O((|L|+|R|) log)
  * per key, no pair blow-up at any scale. Right rows sort before left rows
  * on timestamp ties, so equal timestamps match (`<=` semantics, like
  * DuckDB/kdb ASOF).
  */
object AsOfOps {

  /** Left rows + `asofCol` = greatest right-side `rightTs` ≤ `leftTs` for
    * the same `key` (null when no right row precedes). `tolerance` (a SQL
    * interval/arithmetic fragment, e.g. `INTERVAL 1 HOUR`) additionally
    * requires the match to be no staler than `leftTs - tolerance` — the
    * standard max-staleness bound (pandas `merge_asof` tolerance); stale
    * matches become null, the row itself is kept. */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, asofCol: String = "asof_ts",
           tolerance: Option[String] = None): DataFrame = {
    val rtsType = right.schema(rightTs).dataType
    val lu = left.select(
      col(key).as("__k"), col(leftTs).as("__t"),
      struct(left.columns.map(col): _*).as("__row"),
      lit(null).cast(rtsType).as("__rts"),
      lit(0).as("__side"))
    val ru = right.select(
      col(key).as("__k"), col(rightTs).as("__t"),
      lit(null).cast(StructType(left.schema.fields)).as("__row"),
      col(rightTs).as("__rts"),
      lit(1).as("__side"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = lu.union(ru)
      .withColumn(asofCol, last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val bounded = tolerance.fold(matchedRaw)(t =>
      matchedRaw.withColumn(asofCol,
        expr(s"CASE WHEN `$asofCol` >= __t - $t THEN `$asofCol` END")))
    bounded.select(col("__row.*"), col(asofCol))
  }
}
