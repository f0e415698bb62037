package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits
  * of two sort keys gives a single sort order under which ANY contiguous
  * range of rows spans a small rectangle in (x, y) space, so min/max file
  * statistics prune scans filtered on EITHER column — the 100 TB
  * data-skipping story a plain lexicographic sort only gives the leading
  * column. The reference reaches physical layout only as Redshift
  * SORTKEY DDL shipped over the wire (`execute_sql.py:77`); our engine
  * already maps that to bucketed/sorted DDL (SURVEY §2.2), and this op is
  * the multi-column refinement of it.
  *
  * The z-value is pure integer bit arithmetic (shift/mask/or via
  * addition of disjoint bits), so it hash-gates exactly cross-engine.
  * Values are taken modulo 2^bits (high bits mask off — the same
  * fixed-width truncation Delta's z-ordering applies after range-binning);
  * callers whose domains exceed 2^bits normalize first (rank or
  * min-max bin), as the gated query's natural-key inputs here do not.
  */
object LayoutOps {

  /** The interleaved z-value of two non-negative integer columns, `bits`
    * bits each (bit i of x lands at 2i, of y at 2i+1) — the native
    * codegen [[graft.sql.expressions.ZValue]] kernel (a higher-order
    * `aggregate` fold would drop out of whole-stage codegen; the hot
    * layout path must not — DialectSpec pins the two forms equal). */
  def zValueExpr(x: String, y: String, bits: Int = 21): String = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31; got $bits")
    s"zvalue(cast($x as bigint), cast($y as bigint), $bits)"
  }

  /** The same curve as a pure-SQL fold — the portable reference form the
    * DuckDB oracle mirrors and DialectSpec checks the kernel against.
    * Disjoint bits sum, so `+` IS the bitwise-or. */
  def zValueFoldExpr(x: String, y: String, bits: Int = 21): String = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31; got $bits")
    s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint),
       |  (acc, i) -> acc
       |    + (((cast($x as bigint) >> i) & 1) << (2 * i))
       |    + (((cast($y as bigint) >> i) & 1) << (2 * i + 1)))""".stripMargin
  }

  /** 3-D Morton z-value via the codegen
    * [[graft.sql.expressions.ZValue3]] kernel — the multi-column
    * OPTIMIZE ZORDER case (most production layouts cluster on THREE
    * keys: tenant, date-bucket, entity); bits ≤ 20 per dimension keeps
    * the curve under 2⁶⁰. */
  def zValue3Expr(x: String, y: String, z: String, bits: Int = 20): String = {
    require(bits > 0 && bits <= 20, s"need 0 < bits <= 20; got $bits")
    s"zvalue3(cast($x as bigint), cast($y as bigint), cast($z as bigint), $bits)"
  }

  /** The 3-D curve as a pure-SQL fold — the portable reference form the
    * DuckDB oracle mirrors (disjoint bits sum, so `+` IS bitwise-or). */
  def zValue3FoldExpr(x: String, y: String, z: String, bits: Int = 20): String = {
    require(bits > 0 && bits <= 20, s"need 0 < bits <= 20; got $bits")
    s"""aggregate(sequence(0, ${bits - 1}), cast(0 as bigint),
       |  (acc, i) -> acc
       |    + (((cast($x as bigint) >> i) & 1) << (3 * i))
       |    + (((cast($y as bigint) >> i) & 1) << (3 * i + 1))
       |    + (((cast($z as bigint) >> i) & 1) << (3 * i + 2)))""".stripMargin
  }

  /** Hilbert-curve distance via the codegen
    * [[graft.sql.expressions.HilbertValue]] kernel — the no-diagonal-
    * jumps alternative to [[zValueExpr]]: consecutive curve positions
    * are Manhattan-adjacent cells, so range partitions cover tighter
    * (x, y) rectangles than the z-curve's corner-to-corner leaps
    * (KernelSpec pins the adjacency property). Same layout machinery,
    * strictly better min/max file bounds on skewed query boxes. */
  def hValueExpr(x: String, y: String, bits: Int = 21): String = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31; got $bits")
    s"hvalue(cast($x as bigint), cast($y as bigint), $bits)"
  }

  /** The same Hilbert distance as a pure-SQL struct fold (bit levels
    * high → low; the quadrant XOR spelled as the shared CASE
    * `rx == 0 ? ry : 3 − ry`, and the rotate as two CASE coordinate
    * rewrites) — the portable reference form the DuckDB oracle mirrors
    * (as a recursive CTE — DuckDB's list_reduce cannot carry a struct
    * accumulator over an integer list) and KernelSpec checks the
    * kernel against. */
  def hValueFoldExpr(x: String, y: String, bits: Int = 21): String = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31; got $bits")
    // the & mask mirrors the kernel's input truncation (see hilbertD)
    val mask = (1L << bits) - 1
    s"""aggregate(sequence(${bits - 1}, 0, -1),
       |  struct(cast($x as bigint) & ${mask}L as x, cast($y as bigint) & ${mask}L as y, cast(0 as bigint) as d),
       |  (acc, i) -> struct(
       |    case when (shiftright(acc.y, i) & 1) = 0
       |         then case when (shiftright(acc.x, i) & 1) = 1
       |                   then shiftleft(1L, i) - 1 - acc.y else acc.y end
       |         else acc.x end as x,
       |    case when (shiftright(acc.y, i) & 1) = 0
       |         then case when (shiftright(acc.x, i) & 1) = 1
       |                   then shiftleft(1L, i) - 1 - acc.x else acc.x end
       |         else acc.y end as y,
       |    acc.d + shiftleft(1L, i) * shiftleft(1L, i) *
       |      (case when (shiftright(acc.x, i) & 1) = 0 then (shiftright(acc.y, i) & 1)
       |            else 3 - (shiftright(acc.y, i) & 1) end) as d),
       |  acc -> acc.d)""".stripMargin
  }

  /** Re-layout `df` along the z-curve of (`xCol`, `yCol`): range-partition
    * on the z-value (so partition = contiguous curve segment = small
    * (x, y) rectangle) and sort within partitions (so row groups inside a
    * file are rectangles too). Written as parquet, every partition's
    * min/max on BOTH columns is tight — the skipping OpsSpec asserts the
    * per-partition extents collapse on the dimension a single-column sort
    * leaves unbounded.
    *
    * Each column is min-max normalized to `bitsPerDim` bits BEFORE
    * interleaving (one all-partial 1-row aggregate, broadcast onto the
    * scan): raw interleaving of unequal-width domains parks the narrow
    * column's bits in the low positions, where no partition-sized curve
    * segment ever constrains them — equalizing the budgets is what makes
    * the curve prune on either column, and is exactly the range-binning
    * Delta's OPTIMIZE ZORDER applies first. */
  def zOrder(df: DataFrame, xCol: String, yCol: String, bitsPerDim: Int = 10,
             numPartitions: Int = 32): DataFrame =
    curveOrder(df, Seq(xCol, yCol), bitsPerDim, numPartitions, 31,
      cs => zValueExpr(cs(0), cs(1), bitsPerDim), "zval")

  /** [[zOrder]] along the HILBERT curve instead: consecutive curve
    * positions are Manhattan-adjacent cells (no corner-to-corner
    * diagonal leaps), so contiguous curve segments — i.e. range
    * partitions — cover tighter (x, y) rectangles and per-file min/max
    * bounds prune harder on box queries. Same normalization and
    * machinery; the skipping OpsSpec compares the two curves' extents
    * head-to-head. */
  def hilbertOrder(df: DataFrame, xCol: String, yCol: String, bitsPerDim: Int = 10,
                   numPartitions: Int = 32): DataFrame =
    curveOrder(df, Seq(xCol, yCol), bitsPerDim, numPartitions, 31,
      cs => hValueExpr(cs(0), cs(1), bitsPerDim), "hval")

  /** [[zOrder]] over THREE columns — the production clustering shape
    * (tenant, date-bucket, entity): min-max normalize each dimension to
    * `bitsPerDim` bits, interleave with the [[zValue3Expr]] kernel,
    * range-partition + sort on the curve. Every partition then bounds
    * ALL THREE columns, so min/max file stats prune scans filtered on
    * any of them (the skipping OpsSpec proves it against a
    * single-column sort). */
  def zOrder3(df: DataFrame, xCol: String, yCol: String, zCol: String,
              bitsPerDim: Int = 10, numPartitions: Int = 32): DataFrame =
    curveOrder(df, Seq(xCol, yCol, zCol), bitsPerDim, numPartitions, 20,
      cs => zValue3Expr(cs(0), cs(1), cs(2), bitsPerDim), "zval3")

  /** The shared N-dimensional layout pipeline: min-max normalize every
    * column to `bitsPerDim` bits (one all-partial 1-row aggregate,
    * broadcast onto the scan), compute the curve key, range-partition on
    * it and sort within partitions — one implementation for all three
    * public layouts, so degenerate-range (`mx = mn`) and null handling
    * can never diverge between the 2-D and 3-D paths. */
  private def curveOrder(df: DataFrame, cols: Seq[String], bitsPerDim: Int,
                         numPartitions: Int, maxBits: Int,
                         curve: Seq[String] => String, out: String): DataFrame = {
    require(bitsPerDim > 0 && bitsPerDim <= maxBits,
      s"need 0 < bitsPerDim <= $maxBits; got $bitsPerDim")
    val hi = (1L << bitsPerDim) - 1
    val aliases = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      min(col(c)).cast("double").as(s"zo_mn$i"),
      max(col(c)).cast("double").as(s"zo_mx$i")) }
    val stats = df.agg(aliases.head, aliases.tail: _*)
    def norm(c: String, i: Int) =
      s"""case when zo_mx$i = zo_mn$i then cast(0 as bigint)
         |     else cast(floor((cast($c as double) - zo_mn$i) / (zo_mx$i - zo_mn$i) * $hi) as bigint)
         |end""".stripMargin
    df.crossJoin(broadcast(stats))
      .withColumn(out, expr(curve(cols.zipWithIndex.map {
        case (c, i) => norm(c, i) })))
      .drop(cols.indices.flatMap(i => Seq(s"zo_mn$i", s"zo_mx$i")): _*)
      .repartitionByRange(numPartitions, col(out))
      .sortWithinPartitions(out)
  }
}
