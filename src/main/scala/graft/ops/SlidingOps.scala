package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding RANGE-frame aggregates at cluster parallelism — the scale-out
  * twin of `agg OVER (PARTITION BY key ORDER BY v RANGE BETWEEN x
  * PRECEDING AND y FOLLOWING)` (SURVEY §2.2 window frames; the reference
  * reaches the SQL form through the `--query` pass-through,
  * `execute_sql.py:64,77`; q29_range_frame gates the SQL surface).
  *
  * Spark executes a RANGE frame inside WindowExec, whose task count
  * equals the PARTITION BY cardinality — a 5-group key
  * (o_orderpriority-class) sorts the whole corpus on 5 tasks and
  * re-scans each frame per row. This operator computes the identical
  * COUNT/SUM frames from prefix sums instead:
  *
  *   1. tie-collapse to (key, v) blocks carrying (count, sum) partials —
  *      RANGE frames treat equal order values as peers, so the frame is
  *      a function of the BLOCK, never the row;
  *   2. for each block emit two boundary probes, (v − precede, tag −1)
  *      and (v + follow, tag +1), with zero measures; blocks carry
  *      tag 0. Ordered by (value, tag), the inclusive per-key cumulative
  *      at the hi probe is cum(≤ v + follow) and at the lo probe is
  *      cum(< v − precede) — the tag places a probe before/after the
  *      blocks that share its boundary value exactly as the closed
  *      interval demands;
  *   3. one [[PercentileOps.rangePrefixN]] pass over blocks ∪ probes
  *      (range-partitioned two-pass prefix sums — parallelism tracks the
  *      cluster, not the key cardinality) and the frame aggregate is the
  *      probe-pair difference: hi − lo, exact integer/DECIMAL
  *      arithmetic, so results hash-gate against the declarative window
  *      SQL in any engine.
  *
  * Work is O(|rows| + |blocks|) through keyed exchanges — no per-row
  * frame re-scan, no group-count-bounded stage, nothing buffered per
  * group beyond sort-spill machinery.
  */
object SlidingOps {

  /** Per-row sliding-frame COUNT(*) and SUM(`sumExpr`) over
    * `[v − precede, v + follow]` (closed interval, SQL RANGE BETWEEN
    * semantics) within `key` groups, appended as `n_frame` / `sum_frame`.
    *
    * `precede`/`follow` are offsets in `vCol`'s domain, ANY sign —
    * `precede = -2, follow = 5` is `RANGE BETWEEN 2 FOLLOWING AND 5
    * FOLLOWING`, and an empty frame yields SQL's (0, NULL). Pass them as
    * exact-typed literals (e.g. a DECIMAL literal for a DECIMAL value
    * column) so the boundary arithmetic stays exact in both engines.
    * Null `sumExpr` values are ignored and an all-null frame yields
    * NULL — exact SQL SUM semantics. Rows with a null `vCol`
    * are mutual peers whose frame is exactly the null block — the SQL
    * RANGE rule — because null boundaries sort with the null blocks and
    * the tag ordering brackets them. */
  def rangeFrameAgg(df: DataFrame, key: String, vCol: String,
                    precede: Column, follow: Column,
                    sumExpr: Column): DataFrame = {
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty, s"rangeFrameAgg reserves __-prefixed columns, found ${reserved.mkString(",")}")
    // the output appends n_frame/sum_frame via a join — a pre-existing
    // column of either name would come back ambiguous downstream, not as
    // a clear error (ADVICE r15)
    val clash = df.columns.filter(c => c == "n_frame" || c == "sum_frame")
    require(clash.isEmpty,
      s"rangeFrameAgg appends n_frame/sum_frame; input already has ${clash.mkString(",")}")

    val frames = rangeFrameFromBlocks(
      frameBlocks(df, key, vCol, sumExpr), key, vCol, precede, follow)
    df.join(frames,
        col(key) <=> col("__k") && col(vCol) <=> col("__origin"))
      .drop("__k", "__origin")
  }

  /** The tie-collapsed block stage of [[rangeFrameAgg]]: per-(key, v)
    * (count, sum, non-null count) partials. A LINEAR aggregation —
    * micro-batch partials add — so the streaming twin
    * (`StreamingOps.rangeFrameBlocksStream`) runs this SAME stage in the
    * state store and the read side finishes with
    * [[rangeFrameFromBlocks]]. __bn (non-null contribution count) makes
    * the SQL all-null-frame rule exact: SUM over a frame whose every
    * value is NULL is NULL, not 0 — the prefix difference alone can't
    * tell "empty" from "all null", the count can. */
  def frameBlocks(df: DataFrame, key: String, vCol: String,
                  sumExpr: Column): DataFrame =
    df.groupBy(col(key), col(vCol))
      .agg(count(lit(1)).as("__bc"), sum(sumExpr).as("__bs"),
        count(sumExpr).as("__bn"))

  /** Read-side frame extraction over a [[frameBlocks]] table: the
    * boundary-probe / range-partitioned-prefix pass (steps 2–3 of the
    * scaladoc above), returning one row per block —
    * (`key` as `__k`, `vCol` value as `__origin`, n_frame, sum_frame). */
  def rangeFrameFromBlocks(blocks: DataFrame, key: String, vCol: String,
                           precede: Column, follow: Column): DataFrame = {
    val vType = blocks.schema(vCol).dataType
    val sType = blocks.schema("__bs").dataType
    // enforce the "exact-typed literals" contract instead of documenting
    // it (ADVICE r15): if (v ± offset) resolves to a LOSSY widening of
    // vCol (e.g. DOUBLE offsets against a DECIMAL value column), the
    // probe union below silently widens __pv BY POSITION — coercing
    // every boundary and block value and changing closed-interval
    // inclusion arithmetic. Lossless widenings stay legal: DECIMAL
    // arithmetic necessarily grows precision by one digit at equal
    // scale (18,2 ± 18,2 → 19,2 — exact), and integral types widen
    // exactly. Everything else raises at construction.
    def losslessProbe(pt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      val integral = Set[DataType](ByteType, ShortType, IntegerType, LongType)
      (vType, pt) match {
        case (a, b) if a == b => true
        case (a: DecimalType, b: DecimalType) => a.scale == b.scale
        case (a, b) => integral(a) && integral(b)
      }
    }
    val loType = blocks.select((col(vCol) - precede).as("__t")).schema("__t").dataType
    val hiType = blocks.select((col(vCol) + follow).as("__t")).schema("__t").dataType
    require(losslessProbe(loType) && losslessProbe(hiType),
      s"rangeFrameAgg: lossy boundary type — $vCol is $vType but " +
        s"(v - precede) is $loType and (v + follow) is $hiType; pass " +
        "offsets as exact-typed literals of the value column's type")
    val b0 = blocks.select(col(key), col(vCol).as("__pv"),
      lit(0).as("__tag"), lit(null).cast(vType).as("__origin"),
      col("__bc"), col("__bs"), col("__bn"))
    def probe(pv: Column, tag: Int) = blocks.select(col(key),
      pv.as("__pv"), lit(tag).as("__tag"), col(vCol).as("__origin"),
      lit(0L).as("__bc"), lit(0).cast(sType).as("__bs"), lit(0L).as("__bn"))
    val unioned = b0
      .union(probe(col(vCol) - precede, -1))
      .union(probe(col(vCol) + follow, 1))

    val cum = PercentileOps.rangePrefixN(unioned, key,
      Seq("__pv", "__tag"), Seq("__bc", "__bs", "__bn"))
    cum.filter(col("__tag") =!= 0)
      .groupBy(col(key).as("__k"), col("__origin"))
      .agg(
        max(when(col("__tag") === 1, col("__cum___bc"))).as("__hi_c"),
        max(when(col("__tag") === -1, col("__cum___bc"))).as("__lo_c"),
        max(when(col("__tag") === 1, col("__cum___bs"))).as("__hi_s"),
        max(when(col("__tag") === -1, col("__cum___bs"))).as("__lo_s"),
        max(when(col("__tag") === 1, col("__cum___bn"))).as("__hi_n"),
        max(when(col("__tag") === -1, col("__cum___bn"))).as("__lo_n"))
      .select(col("__k"), col("__origin"),
        // greatest(…, 0): a sign-flipped offset pair (forward-only
        // windows, precede < 0) can make the interval empty, where the
        // raw prefix difference goes negative — SQL says COUNT 0
        greatest(col("__hi_c") - col("__lo_c"), lit(0L)).as("n_frame"),
        when(col("__hi_n") > col("__lo_n"),
          col("__hi_s") - col("__lo_s")).as("sum_frame"))
  }
}
