package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Exact per-group percentiles via distributed sort + rank — the
  * bounded-memory scale path for MEDIAN / PERCENTILE_CONT / PERCENTILE_DISC
  * (SURVEY §2.3 q18/q25; the reference reaches them through the `--query`
  * pass-through, `execute_sql.py:64,77`).
  *
  * Spark's exact `percentile`/`percentile_cont` aggregate buffers every
  * value of a group in executor memory (an ObjectHashAggregate over an
  * OpenHashMap) — at 100 TB a single hot group OOMs the executor. This
  * operator computes the IDENTICAL result (bit-equal doubles, same
  * interpolation arithmetic as Spark's `Percentile`, asserted in OpsSpec)
  * with nothing held per group:
  *
  *   1. rank each non-null value inside its group — `row_number()` plus a
  *      partition-frame `count(*)` over ONE exchange per value column
  *      (the two windows share the (key, value)-sorted partitioning, so
  *      Catalyst plans a single sort);
  *   2. keep only the rows whose rank can contribute to a requested
  *      percentile (floor/ceil of `p·(n−1)` for CONT, `ceil(p·n)` for
  *      DISC) — at most 3·|specs| rows per group survive;
  *   3. one hash aggregation interpolates:
  *      `(ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi` — the exact
  *      expression Spark's `Percentile.getPercentile` evaluates, so
  *      results are bit-identical to the buffering implementation.
  *
  * Memory per task is O(1) beyond the sort spill machinery (which spills
  * to disk under pressure); no state scales with group cardinality or
  * group size. Cost is one shuffle+sort per distinct value column — the
  * same exchange count as the buffering aggregate, minus the unbounded
  * per-group heap.
  */
object PercentileOps {

  /** One requested percentile: `disc = false` → PERCENTILE_CONT semantics
    * (linear interpolation), `disc = true` → PERCENTILE_DISC (first value
    * whose cumulative distribution reaches p). */
  final case class PSpec(valueCol: String, p: Double, out: String, disc: Boolean = false) {
    require(p >= 0.0 && p <= 1.0, s"percentile $p out of [0,1]")
  }

  /** Per-`key` exact percentiles for `specs`, plus a trailing `n_rows`
    * count of ALL group rows (null values included — matching
    * `COUNT(*)` next to a percentile aggregate). Output columns:
    * key, specs.map(_.out) in order, n_rows. */
  def sortedPercentiles(df: DataFrame, key: String, specs: Seq[PSpec]): DataFrame = {
    require(specs.nonEmpty, "sortedPercentiles needs at least one spec")
    require(specs.map(_.out).distinct.length == specs.length,
      "duplicate output column names")
    val nRows = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))

    // one ranked pass per distinct value column (each needs its own sort
    // order); keep spec order for the final projection
    val perCol: Seq[DataFrame] = specs.groupBy(_.valueCol).toSeq.map {
      case (vc, colSpecs) =>
        val byKey = Window.partitionBy(col(key))
        val ranked = df
          .filter(col(vc).isNotNull)
          .select(col(key), col(vc).cast(DoubleType).as("__v"))
          .withColumn("__rn", row_number().over(byKey.orderBy(col("__v"))))
          .withColumn("__n", count(lit(1)).over(byKey))

        // ranks that can contribute to any requested percentile of this col
        def loRank(p: Double): Column =
          floor(lit(p) * (col("__n") - 1)).cast(LongType) + 1
        def hiRank(p: Double): Column =
          ceil(lit(p) * (col("__n") - 1)).cast(LongType) + 1
        def discRank(p: Double): Column =
          greatest(lit(1L), ceil(lit(p) * col("__n")).cast(LongType))
        val wanted = colSpecs.map { s =>
          if (s.disc) col("__rn") === discRank(s.p)
          else col("__rn") === loRank(s.p) || col("__rn") === hiRank(s.p)
        }.reduce(_ || _)

        val aggs = colSpecs.flatMap { s =>
          if (s.disc)
            Seq(max(when(col("__rn") === discRank(s.p), col("__v")))
              .as(s.out))
          else Seq(
            max(when(col("__rn") === loRank(s.p), col("__v"))).as(s"__lo_${s.out}"),
            max(when(col("__rn") === hiRank(s.p), col("__v"))).as(s"__hi_${s.out}"))
        }
        val agged = ranked.filter(wanted)
          .groupBy(col(key))
          .agg(max(col("__n")).as("__nv"), aggs: _*)

        // CONT interpolation — the same double arithmetic as Spark's
        // Percentile.getPercentile: (higher−pos)·lower + (pos−lower)·higher
        val outCols: Seq[Column] = colSpecs.map { s =>
          if (s.disc) col(s.out)
          else {
            val pos = lit(s.p) * (col("__nv") - 1).cast(DoubleType)
            val lo = col(s"__lo_${s.out}")
            val hi = col(s"__hi_${s.out}")
            when(floor(pos) === ceil(pos), lo)
              .otherwise((ceil(pos) - pos) * lo + (pos - floor(pos)) * hi)
              .as(s.out)
          }
        }
        agged.select(col(key) +: outCols: _*)
    }

    // per-column aggregates are one row per group — these joins broadcast.
    // Left joins from the full key set: a group whose values are all NULL
    // still appears, with NULL percentiles (the SQL aggregate's behavior).
    perCol.foldLeft(nRows)((acc, pc) => acc.join(pc, Seq(key), "left"))
      .select(col(key) +: specs.map(s => col(s.out)) :+ col("n_rows"): _*)
  }

  /** One weighted discrete percentile: the smallest value whose
    * cumulative weight reaches qNum/qDen of the group's total weight.
    * The quantile is a RATIONAL, not a double — the selection predicate
    * is `cumw·qDen ≥ qNum·W`, pure BIGINT, so there is no floating
    * arithmetic anywhere in the operator. */
  final case class WSpec(qNum: Long, qDen: Long, out: String) {
    require(qNum > 0 && qDen > 0 && qNum <= qDen, s"need 0 < $qNum/$qDen <= 1")
  }

  /** Per-`key` WEIGHTED discrete percentiles — the quantile form a
    * curation pipeline needs once rows carry sampling/mixture weights
    * (epoch temperatures, language upsampling): the q-quantile of the
    * weight-expanded distribution, computed without expanding anything.
    * PERCENTILE_DISC semantics over integer weights: the result is an
    * actual data value, selected by an all-BIGINT cumulative-weight
    * predicate — every column hash-gates with zero IEEE involvement
    * (the unweighted disc path degenerates to this with weight 1).
    *
    * Scale shape: one (key, value)-keyed weight aggregation (partial
    * map-side), one per-group cumulative window over DISTINCT values,
    * one filtering aggregation — the [[sortedPercentiles]] memory
    * contract: nothing buffered per group beyond sort machinery. */
  def weightedDiscPercentiles(df: DataFrame, key: String, valueCol: String,
                              weightCol: String, specs: Seq[WSpec]): DataFrame = {
    require(specs.nonEmpty, "weightedDiscPercentiles needs at least one spec")
    require(specs.map(_.out).distinct.length == specs.length,
      "duplicate output column names")
    val byKey = Window.partitionBy(col(key))
    // integer weights are the CONTRACT, not an assumption: a fractional
    // weight would silently truncate (2.9 → 2) and a 0 < w < 1 row would
    // vanish entirely after the cast — and the pre-cast-filtering oracle
    // would disagree. Raise on the first non-integral weight instead
    // (ADVICE r11); callers with fractional weights rescale first.
    val g = df
      .filter(col(valueCol).isNotNull)
      .selectExpr(key, s"$valueCol as __v",
        s"""case when $weightCol is not null
           |       and cast($weightCol as double) != floor(cast($weightCol as double))
           |  then cast(raise_error(concat(
           |    'weightedDiscPercentiles: non-integral weight ',
           |    cast($weightCol as string),
           |    ' — integer weights are the contract; rescale first')) as bigint)
           |  else cast($weightCol as bigint) end as __w""".stripMargin)
      .filter(col("__w") > 0)
      .groupBy(col(key), col("__v")).agg(sum("__w").as("__wv"))
      .withColumn("__cumw", sum("__wv").over(byKey.orderBy(col("__v"))))
      .withColumn("__tw", sum("__wv").over(byKey))
    val aggs = specs.map { s =>
      min(when(col("__cumw") * lit(s.qDen) >= lit(s.qNum) * col("__tw"),
        col("__v"))).as(s.out)
    } :+ max(col("__tw")).as("total_weight")
    g.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }
}
