package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE-style data-quality pass a warehouse user
  * runs before trusting a table (the reference reaches profiling SQL
  * through the `--query` pass-through, `execute_sql.py:64,77`): per
  * numeric column, row/null/distinct counts, min/max, and an equal-width
  * histogram.
  *
  * The bucket index is computed with an EXPLICIT shared formula —
  * `least(⌊((x − lo) / (hi − lo)) · nb⌋, nb − 1)` — rather than SQL
  * `width_bucket`, whose boundary arithmetic is implementation-defined;
  * with the formula spelled out, both engines evaluate the identical IEEE
  * expression and every bucket count hash-gates.
  *
  * Scale shape: two passes per column — one all-partial aggregation for
  * the summary (min/max/counts spill-free), one (bucket)-keyed partial
  * aggregation for the histogram with the 1-row summary broadcast onto
  * the scan. Exact NDV is a count-distinct shuffle; at 100 TB swap in
  * `approx_count_distinct` (same plan shape, bounded state) — the gate
  * uses the exact form so the oracle can reproduce it.
  */
object ProfileOps {

  def profile(df: DataFrame, cols: Seq[String], nBuckets: Int = 10): DataFrame = {
    require(cols.nonEmpty && nBuckets > 0, "profile needs columns and buckets")
    cols.map { c =>
      val stats = df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("ndv"),
        min(col(c)).cast("double").as("col_min"),
        max(col(c)).cast("double").as("col_max"))
      val bucket = // constant column (hi = lo) degenerates to one bucket
        s"""case when col_max = col_min then 0
           |     else least(cast(floor(((cast(`$c` as double) - col_min) / (col_max - col_min))
           |       * $nBuckets) as bigint), ${nBuckets - 1}) end as bucket""".stripMargin
      df.filter(col(c).isNotNull)
        .crossJoin(broadcast(stats))
        .selectExpr("col_min", "col_max", "n_rows", "n_null", "ndv", bucket)
        .groupBy("bucket", "col_min", "col_max", "n_rows", "n_null", "ndv")
        .agg(count(lit(1)).as("n"))
        .selectExpr(s"'$c' as col_name", "bucket", "n",
          "n_rows", "n_null", "ndv", "col_min", "col_max")
    }.reduce(_.unionAll(_)).orderBy("col_name", "bucket")
  }
}
