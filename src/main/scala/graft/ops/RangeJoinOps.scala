package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join — `probe.v BETWEEN build.lo AND build.hi` — as a
  * bucketed EQUI join instead of the nested-loop plan Spark gives a raw
  * non-equi condition (SURVEY §2.2 "Range/interval join", the reference
  * reaches it through the `--query` pass-through, `execute_sql.py:64,77`).
  *
  * Spark has no range-join optimization: `ON v BETWEEN lo AND hi` plans as
  * BroadcastNestedLoopJoin (build side small) or CartesianProduct (both
  * large) — O(|probe|·|build|) comparisons, a non-starter when both sides
  * are big. The standard fix (same idea as Databricks' range-join bins):
  *
  *   1. pick a bucket width W in the value domain;
  *   2. each build interval replicates to every W-aligned bucket it
  *      overlaps (`explode(sequence(⌊lo/W⌋, ⌊hi/W⌋))` — a codegen'd
  *      generator, no driver loop);
  *   3. each probe row lands in exactly ONE bucket (`⌊v/W⌋`);
  *   4. equi-join on the bucket id + the residual BETWEEN predicate.
  *
  * Because a probe row has a single bucket, every qualifying (probe, build)
  * pair meets in exactly one bucket — no post-join dedup. The equi key lets
  * Catalyst plan a shuffled hash / sort-merge join (or broadcast when the
  * exploded build side is small): the work is O(|probe| + |build|·(len/W))
  * rows through one keyed shuffle, AQE handles bucket skew, and W trades
  * build-side replication (len/W + 1 copies) against per-bucket probe
  * fan-in. Pick W ≈ the typical interval length.
  */
object RangeJoinOps {

  /** Join `probe` to `build` on `probe(vCol) BETWEEN build(loCol) AND
    * build(hiCol)` (closed interval, SQL BETWEEN semantics).
    *
    * `units` maps the value domain to LONG bucket units (must be monotone
    * non-decreasing, e.g. `c => unix_date(c.cast("date"))` for day
    * granularity over timestamps; identity cast for numerics). Monotonicity
    * guarantees the bucket range of [lo, hi] covers the bucket of every v
    * inside it. `bucketWidth` is in those units.
    *
    * Output schema: probe.* ++ build.*.
    */
  def intervalJoin(probe: DataFrame, build: DataFrame,
                   vCol: String, loCol: String, hiCol: String,
                   bucketWidth: Long,
                   units: Column => Column): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("__bkt", "__u_lo", "__u_hi")
    require(!(probe.columns ++ build.columns).exists(reserved.contains),
      s"intervalJoin reserves column names ${reserved.mkString(", ")}")

    val b = build
      .withColumn("__u_lo", floorDiv(units(col(loCol)), bucketWidth))
      .withColumn("__u_hi", floorDiv(units(col(hiCol)), bucketWidth))
      .filter(col("__u_lo") <= col("__u_hi")) // empty/inverted intervals match nothing
      .withColumn("__bkt", explode(sequence(col("__u_lo"), col("__u_hi"))))
      .drop("__u_lo", "__u_hi")
    val p = probe.withColumn("__bkt", floorDiv(units(col(vCol)), bucketWidth))

    p.join(b,
        p("__bkt") === b("__bkt") &&
          p(vCol) >= b(loCol) && p(vCol) <= b(hiCol))
      .drop("__bkt")
  }

  /** Floor division on longs, exact over the full range (no double
    * round-trip) and negative-safe (-1 floorDiv 7 = -1, not 0): subtract
    * the non-negative pmod so the numerator is exactly divisible, then
    * divide in DECIMAL. */
  private def floorDiv(c: Column, w: Long): Column = {
    val l = c.cast("long")
    ((l - pmod(l, lit(w))).cast("decimal(20,0)") / lit(w)).cast("long")
  }
}
