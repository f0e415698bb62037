package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{QueryDef, Tables}

/** The declared t2 query corpus (SURVEY.md §2.3) — the SQL surface a user of
  * the reference reaches through the `--query` pass-through
  * (`/root/reference/amazonredshift_blueprints/blueprints/execute_sql.py:64,77`,
  * `store_query_results.py:103,132`), re-expressed Spark-first with the
  * DataFrame API so Catalyst plans it (pushdown, pruning, broadcast joins).
  *
  * Canonicalization contract shared with the DuckDB oracles (QueryDef doc):
  *  - per-row double arithmetic uses identical expression trees in both
  *    engines (IEEE ops are deterministic given the same operand order);
  *  - order-sensitive aggregates (SUM/AVG of doubles) accumulate exactly via
  *    DECIMAL(18,6) and only then cast to DOUBLE, so the result is
  *    independent of partitioning / addition order at any scale;
  *  - every query ends in a total-order ORDER BY (unique tie-break key);
  *  - no raw TIMESTAMP columns in outputs — DATE or epoch micros instead;
  *  - computed integer outputs cast to BIGINT on both sides.
  */
object T2 {
  private val M = DecimalType(18, 6)
  private def dec(c: Column): Column = c.cast(M)
  /** Order-independent exact sum of a double column, returned as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Deterministic mean: exact decimal sum, double division by count. */
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  /** Shared WITH RECURSIVE text for q20 — identical in Spark and DuckDB.
    * (Declared before `defs`, which captures it at object init.) */
  private val recursiveSql: String =
    """WITH RECURSIVE m(mo) AS (
      |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
      |SELECT mo, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      |FROM m LEFT JOIN orders
      |  ON month(o_orderdate) = mo AND year(o_orderdate) = 1995
      |GROUP BY mo
      |ORDER BY mo""".stripMargin

  /** Shared UNPIVOT text for q32 — the SQL-standard form both engines
    * parse identically (columns→rows; NULL measures dropped per the
    * standard default). No arithmetic anywhere: raw doubles pass through
    * bit-identical. */
  private val unpivotSql: String =
    """SELECT l_orderkey, l_linenumber, metric, val
      |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      |      FROM lineitem)
      |UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin

  /** Shared QUALIFY text for q33 — DuckDB runs it natively, Spark runs the
    * rewriter's output (declared before `defs`: eager capture). */
  private val qualifySql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM orders
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // 1. Scan + filter + project (lineitem pricing). Filters push to parquet.
    QueryDef(
      "q01_scan_filter",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.02, 0.08) &&
              col("l_quantity") < 30.0)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |       l_extendedprice * (1.0 - l_discount) AS net_price
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate <  TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.02 AND 0.08
             |  AND l_quantity < 30.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // 2. Inner equi-join chain (TPC-H Q5 shape): region⋈nation⋈customer⋈orders⋈lineitem.
    //    Dims (region, nation) are broadcast — at 100 TB the only shuffles are
    //    lineitem⋈orders and ⋈customer on their join keys, then the 25-group agg.
    QueryDef(
      "q02_join_chain",
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        val n = t(s, d, "nation")
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = t(s, d, "lineitem")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |       COUNT(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <  TIMESTAMP '1998-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // 3. Anti join: customers with no urgent order. Spark plans left_anti as
    //    a broadcast/shuffled hash anti join — no row explosion, streams at
    //    any scale. (Filtered to urgent so the fixture result is non-empty:
    //    every customer has *some* order at sf≥0.01.)
    QueryDef(
      "q03_anti_join",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // 4. Semi join via EXISTS: customers with at least one finished big order.
    QueryDef(
      "q04_semi_join",
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
          .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderstatus = 'F' AND o.o_totalprice > 100000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // 5. Non-equi theta join. Both sides are dim tables (supplier × part), so
    //    BroadcastNestedLoopJoin is the correct physical plan; at 100 TB this
    //    stays safe because neither side is a fact table.
    QueryDef(
      "q05_theta_join",
      (s, d) => {
        val sup = t(s, d, "supplier")
        val p = t(s, d, "part")
        sup.join(
            p,
            col("p_retailprice") >= col("s_acctbal") &&
              col("p_retailprice") < col("s_acctbal") + 100.0)
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, COUNT(*) AS n_parts,
             |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
             |FROM supplier JOIN part
             |  ON p_retailprice >= s_acctbal AND p_retailprice < s_acctbal + 100.0
             |GROUP BY s_suppkey, s_name
             |ORDER BY s_suppkey""".stripMargin)),

    // 6. Group-by aggregate battery + HAVING (TPC-H Q1 shape). Partial
    //    (map-side) aggregation is automatic for all of these.
    QueryDef(
      "q06_group_agg",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("count_order"))
          .filter(col("count_order") > 100)
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
             |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
             |       COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |HAVING COUNT(*) > 100
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // 7. COUNT(DISTINCT) + multi-distinct in one aggregate (Catalyst expands
    //    to the two-phase distinct plan automatically). The pair-distinct is
    //    expressed as a concat key so the oracle is portable.
    QueryDef(
      "q07_count_distinct",
      (s, d) => {
        val l = t(s, d, "lineitem")
        l.groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("nd_part"),
            countDistinct(col("l_suppkey")).as("nd_supp"),
            countDistinct(concat_ws(":", col("l_partkey"), col("l_suppkey"))).as("nd_pair"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       COUNT(DISTINCT l_partkey) AS nd_part,
             |       COUNT(DISTINCT l_suppkey) AS nd_supp,
             |       COUNT(DISTINCT l_partkey || ':' || l_suppkey) AS nd_pair,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 8. CUBE multi-grouping with grouping_id.
    QueryDef(
      "q08_cube",
      (s, d) => {
        val o = t(s, d, "orders")
        o.cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"),
            grouping_id().as("gid"))
          .select(
            col("gid").cast("long").as("gid"), col("o_orderpriority"),
            col("o_orderstatus"), col("n_orders"), col("sum_total"))
          .orderBy(
            col("gid"), col("o_orderpriority").asc_nulls_first,
            col("o_orderstatus").asc_nulls_first)
      },
      Some("""SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
             |       o_orderpriority, o_orderstatus,
             |       COUNT(*) AS n_orders,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
             |FROM orders
             |GROUP BY CUBE (o_orderpriority, o_orderstatus)
             |ORDER BY gid, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)),

    // 9. Window ranking: top-3 orders per customer. Single shuffle on
    //    o_custkey; per-key state is bounded (uniform keys — noted for skew).
    QueryDef(
      "q09_window_rank",
      (s, d) => {
        val o = t(s, d, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn").cast("long").as("rn"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
             |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |             ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |      FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_custkey, rn""".stripMargin)),

    // 10. Window analytics: LAG/LEAD/FIRST_VALUE + running sum (exact decimal
    //     accumulation so the running total is order-stable).
    QueryDef(
      "q10_window_analytic",
      (s, d) => {
        val o = t(s, d, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(
            col("o_custkey"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("o_date"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            first(col("o_totalprice")).over(run).as("first_price"),
            sum(dec(col("o_totalprice"))).over(run).cast(DoubleType).as("run_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
             |       LAG(o_totalprice, 1)  OVER w AS prev_price,
             |       LEAD(o_totalprice, 1) OVER w AS next_price,
             |       FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
             |           ORDER BY o_orderdate, o_orderkey
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
             |           ORDER BY o_orderdate, o_orderkey
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // 11. RATIO_TO_REPORT(x) OVER (PARTITION BY …) rewrite: x / sum(x) over
    //     the partition (Redshift-only function; SURVEY §2.2 🔧).
    QueryDef(
      "q11_ratio_to_report",
      (s, d) => {
        val o = t(s, d, "orders")
        val w = Window.partitionBy(col("o_orderpriority"))
        o.select(
            col("o_orderkey"), col("o_orderpriority"),
            (col("o_totalprice") / sum(dec(col("o_totalprice"))).over(w).cast(DoubleType)).as("ratio"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |       o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             |           OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS ratio
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // 12. Sort / LIMIT / OFFSET (Redshift `TOP n` rewrites to LIMIT — dialect
    //     layer). Spark pushes this as TakeOrderedAndProject, no full sort.
    QueryDef(
      "q12_limit_offset",
      (s, d) => {
        val o = t(s, d, "orders")
        o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(10)
          .limit(50)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 50 OFFSET 10""".stripMargin)),

    // 13. Set ops: INTERSECT / EXCEPT / UNION ALL between order subsets.
    QueryDef(
      "q13_set_ops",
      (s, d) => {
        val o = t(s, d, "orders")
        val fCust = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
        val uCust = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")).distinct()
        fCust.intersect(uCust).withColumn("tag", lit("both"))
          .unionByName(fCust.except(uCust).withColumn("tag", lit("f_only")))
          .unionByName(uCust.except(fCust).withColumn("tag", lit("u_only")))
          .select(col("tag"), col("o_custkey"))
          .orderBy(col("tag"), col("o_custkey"))
      },
      Some("""WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
             |     u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
             |SELECT tag, o_custkey FROM (
             |  SELECT 'both'   AS tag, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM u)
             |  UNION ALL
             |  SELECT 'f_only' AS tag, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM u)
             |  UNION ALL
             |  SELECT 'u_only' AS tag, o_custkey FROM (SELECT o_custkey FROM u EXCEPT SELECT o_custkey FROM f)
             |)
             |ORDER BY tag, o_custkey""".stripMargin)),

    // 14. Scalar-function battery: string / date / math / conditional.
    //     All per-row, all codegen'd; only IEEE-deterministic math (no pow,
    //     no round-on-double — half-up vs half-even differs across engines).
    QueryDef(
      "q14_scalar_battery",
      (s, d) => {
        val o = t(s, d, "orders")
        o.select(
            col("o_orderkey"),
            upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
            lpad(col("o_orderstatus"), 3, "_").as("status_pad"),
            element_at(split(col("o_orderpriority"), "-"), 2).as("pri_name"),
            regexp_replace(col("o_orderpriority"), "[0-9]+-", "").as("pri_clean"),
            to_date(date_trunc("month", col("o_orderdate"))).as("order_month"),
            datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).cast("long").as("days_to_2002"),
            year(col("o_orderdate")).cast("long").as("o_year"),
            month(col("o_orderdate")).cast("long").as("o_month"),
            abs(col("o_totalprice") - 100000.0).as("abs_dev"),
            floor(col("o_totalprice")).cast("long").as("price_floor"),
            ceil(col("o_totalprice")).cast("long").as("price_ceil"),
            sqrt(col("o_totalprice")).as("price_sqrt"),
            (col("o_orderkey") % 7).as("key_mod7"),
            when(col("o_orderstatus") === "F", "closed")
              .when(col("o_orderstatus") === "O", "open")
              .otherwise("pending").as("status_word"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("?")).as("status_np"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |       UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS pri3,
             |       LPAD(o_orderstatus, 3, '_') AS status_pad,
             |       SPLIT_PART(o_orderpriority, '-', 2) AS pri_name,
             |       REGEXP_REPLACE(o_orderpriority, '[0-9]+-', '') AS pri_clean,
             |       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
             |       CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
             |       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
             |       CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
             |       ABS(o_totalprice - 100000.0) AS abs_dev,
             |       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
             |       CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
             |       SQRT(o_totalprice) AS price_sqrt,
             |       o_orderkey % 7 AS key_mod7,
             |       CASE o_orderstatus WHEN 'F' THEN 'closed' WHEN 'O' THEN 'open'
             |            ELSE 'pending' END AS status_word,
             |       COALESCE(NULLIF(o_orderstatus, 'P'), '?') AS status_np
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // 15. CTE + scalar subquery + correlated EXISTS: customers whose order
    //     total exceeds 1.5× the average customer total and who have an
    //     urgent order. The scalar is a broadcast cross join (1 row).
    QueryDef(
      "q15_cte_subquery",
      (s, d) => {
        val o = t(s, d, "orders")
        val totals = o.groupBy(col("o_custkey"))
          .agg(dsum(col("o_totalprice")).as("cust_total"))
        val avgTotal = totals.agg(davg(col("cust_total")).as("avg_total"))
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("u_custkey"))
        totals.join(broadcast(avgTotal))
          .filter(col("cust_total") > col("avg_total") * 1.5)
          .join(urgent, col("o_custkey") === col("u_custkey"), "left_semi")
          .select(col("o_custkey"), col("cust_total"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH cust_tot AS (
             |  SELECT o_custkey,
             |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS cust_total
             |  FROM orders GROUP BY o_custkey)
             |SELECT c.o_custkey, c.cust_total
             |FROM cust_tot c
             |WHERE c.cust_total > (SELECT CAST(SUM(CAST(cust_total AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             |                      FROM cust_tot) * 1.5
             |  AND EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.o_custkey AND o.o_orderpriority = '1-URGENT')
             |ORDER BY o_custkey""".stripMargin)),

    // 16. LISTAGG-equivalent ordered string agg per group (Redshift
    //     LISTAGG(x, sep) WITHIN GROUP (ORDER BY x)): collect_list +
    //     array_sort is order-stable regardless of partitioning.
    QueryDef(
      "q16_listagg",
      (s, d) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            concat_ws("|", array_sort(collect_list(col("c_name")))).as("cust_list"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_cust,
             |       STRING_AGG(c_name, '|' ORDER BY c_name) AS cust_list
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // 17. Batch sessionization over events: 30-min gap splits, via LAG +
    //     cumulative flag. One shuffle on user_id; all window state is
    //     per-user and streamed — never a driver-side collect.
    QueryDef(
      "q17_sessionize",
      (s, d) => {
        val e = t(s, d, "events")
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("start_us"),
            max(unix_micros(col("ts"))).as("end_us"),
            dsum(col("value")).as("total_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, value,
             |         epoch_us(ts) - LAG(epoch_us(ts), 1)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events),
             |f AS (
             |  SELECT user_id, ts, value,
             |         CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, COUNT(*) AS n_events,
             |       MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us,
             |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
             |FROM f
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // 18. MEDIAN / PERCENTILE_CONT: exact percentiles per group.
    QueryDef(
      "q18_percentiles",
      (s, d) => {
        val l = t(s, d, "lineitem")
        // written in the natural one-aggregate-per-percentile form; the
        // MergePercentileRule optimizer rule (GraftExtensions) collapses
        // the two extendedprice percentiles into ONE shared array
        // buffer — PlanSpec pins that exactly one Percentile aggregate
        // survives per value column here
        l.groupBy(col("l_returnflag"))
          .agg(
            expr("median(l_quantity)").as("med_qty"),
            expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
            expr("percentile(l_extendedprice, 0.75)").as("p75_price"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       MEDIAN(l_quantity) AS med_qty,
             |       QUANTILE_CONT(l_extendedprice, 0.25) AS p25_price,
             |       QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 18b. approx_percentile scale twin of q18: the exact sort-based
    //      percentile buffers every group value (memory-unsafe at 100×
    //      scale); approx_percentile keeps a bounded Greenwald-Khanna-style
    //      sketch per group. The sketch values are engine-specific, so the
    //      gate is SELF-CERTIFYING (VERDICT r15 #5): the query emits the
    //      EXACT percentiles (through PercentileOps' bounded-memory rank
    //      path — bit-equal to the buffering aggregate, q18c's gate) plus
    //      one boolean per sketch value asserting |approx − exact| ≤
    //      5%·|exact| + 1e-9 (the OpsSpec bound), and the oracle expects
    //      literal TRUE — a drifting sketch flips the boolean and fails
    //      the full rows+schema+hash gate instead of hiding in a
    //      rows-only check.
    QueryDef(
      "q18_percentiles_approx",
      (s, d) => {
        import graft.ops.PercentileOps.{sortedPercentiles, PSpec}
        val l = t(s, d, "lineitem")
        val approx = l.groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_quantity, 0.5, 10000)").as("__amed"),
            expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("__a25"),
            expr("approx_percentile(l_extendedprice, 0.75, 10000)").as("__a75"))
        sortedPercentiles(l, "l_returnflag", Seq(
            PSpec("l_quantity", 0.5, "med_qty"),
            PSpec("l_extendedprice", 0.25, "p25_price"),
            PSpec("l_extendedprice", 0.75, "p75_price")))
          .join(approx, Seq("l_returnflag"))
          .selectExpr("l_returnflag", "med_qty", "p25_price", "p75_price",
            "n_rows",
            "abs(__amed - med_qty) <= 0.05 * abs(med_qty) + 1e-9 as med_within_bound",
            "abs(__a25 - p25_price) <= 0.05 * abs(p25_price) + 1e-9 as p25_within_bound",
            "abs(__a75 - p75_price) <= 0.05 * abs(p75_price) + 1e-9 as p75_within_bound")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       MEDIAN(l_quantity) AS med_qty,
             |       QUANTILE_CONT(l_extendedprice, 0.25) AS p25_price,
             |       QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price,
             |       COUNT(*) AS n_rows,
             |       TRUE AS med_within_bound,
             |       TRUE AS p25_within_bound,
             |       TRUE AS p75_within_bound
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 18c. EXACT bounded-memory twin of q18 (VERDICT r7 #2): the same
    //      median + two percentiles through PercentileOps' rank path —
    //      windows + plain HashAggregate, O(1) per-group memory — instead
    //      of the buffering median/percentile ObjectHashAggregate that
    //      OOMs on a hot group at 100×. Exercises the multi-value-column
    //      case (l_quantity AND l_extendedprice → two ranked passes).
    //      Exact → shares q18's full hash oracle; OpsSpec additionally
    //      asserts bit-equality against the buffering aggregate.
    QueryDef(
      "q18_percentiles_sorted",
      (s, d) => {
        import graft.ops.PercentileOps.{sortedPercentiles, PSpec}
        sortedPercentiles(t(s, d, "lineitem"), "l_returnflag", Seq(
            PSpec("l_quantity", 0.5, "med_qty"),
            PSpec("l_extendedprice", 0.25, "p25_price"),
            PSpec("l_extendedprice", 0.75, "p75_price")))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |       MEDIAN(l_quantity) AS med_qty,
             |       QUANTILE_CONT(l_extendedprice, 0.25) AS p25_price,
             |       QUANTILE_CONT(l_extendedprice, 0.75) AS p75_price,
             |       COUNT(*) AS n_rows
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 19. Redshift JSON surface over events.props (SURVEY §2.2 JSON 🔧):
    //     JSON_EXTRACT_PATH_TEXT / IS_VALID_JSON resolve through
    //     GraftExtensions onto Spark's JSON-path machinery; the projection
    //     stays one codegen'd map stage over the scan.
    QueryDef(
      "q19_json_fns",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(
          """SELECT event_id,
            |       json_extract_path_text(props, 'k') AS k_txt,
            |       CAST(json_extract_path_text(props, 'k') AS BIGINT) AS k_num,
            |       is_valid_json(props) AS valid
            |FROM events
            |WHERE CAST(json_extract_path_text(props, 'k') AS BIGINT) % 2 = 0
            |ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id,
             |       json_extract_string(props, '$.k') AS k_txt,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             |       json_valid(props) AS valid
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
             |ORDER BY event_id""".stripMargin)),

    // 20. Recursive CTE (SURVEY §2.2 🔴 → native in Spark 4): a 12-month
    //     seed relation built by recursion, outer-joined to per-month 1995
    //     order counts. Both engines run the same WITH RECURSIVE text.
    QueryDef(
      "q20_recursive_cte",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(recursiveSql)
      },
      Some(recursiveSql)),

    // 21. HLLSKETCH ops (SURVEY §2.2 🔴 → done): materialized binary
    //     sketches per group, merged with hll_combine — the
    //     pre-aggregate-then-union pattern that avoids rescans at scale.
    //     Estimates are engine-specific (DataSketches vs DuckDB's HLL),
    //     so the gate is SELF-CERTIFYING (VERDICT r15 #5): each row
    //     carries the EXACT distinct count (oracle-checkable) plus
    //     TRUE-expected booleans asserting each estimate lands within
    //     3·rsd of exact — 5% for the DataSketches sketch paths
    //     (lgK = 12 → rsd ≈ 1.6%), 15% for the direct hll() aggregate
    //     (HyperLogLog++ at Spark's default rsd = 5%; its sf0.01 errors
    //     measure 4.8–5.7%, squarely the 1·rsd regime a 5% bound would
    //     flake on). A drifting sketch flips a boolean and fails the
    //     full rows+schema+hash gate.
    QueryDef(
      "q21_hll_sketch",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """WITH per_status AS (
            |  SELECT o_orderstatus, hll_create_sketch(o_custkey) AS sk,
            |         hll(o_custkey) AS n_approx
            |  FROM orders GROUP BY o_orderstatus),
            |exact AS (
            |  SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact
            |  FROM orders GROUP BY o_orderstatus),
            |all_exact AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders)
            |SELECT p.o_orderstatus, e.n_exact,
            |       abs(hll_cardinality(p.sk) - e.n_exact) <= 0.05 * e.n_exact
            |         AS sketch_within_bound,
            |       abs(p.n_approx - e.n_exact) <= 0.15 * e.n_exact
            |         AS direct_within_bound
            |FROM per_status p JOIN exact e ON p.o_orderstatus = e.o_orderstatus
            |UNION ALL
            |SELECT 'ALL' AS o_orderstatus, a.n_exact,
            |       abs(hll_cardinality(hll_combine(p.sk)) - a.n_exact)
            |         <= 0.05 * a.n_exact AS sketch_within_bound,
            |       CAST(NULL AS BOOLEAN) AS direct_within_bound
            |FROM per_status p CROSS JOIN all_exact a
            |GROUP BY a.n_exact
            |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact,
             |       TRUE AS sketch_within_bound, TRUE AS direct_within_bound
             |FROM orders GROUP BY o_orderstatus
             |UNION ALL
             |SELECT 'ALL' AS o_orderstatus, COUNT(DISTINCT o_custkey) AS n_exact,
             |       TRUE AS sketch_within_bound,
             |       CAST(NULL AS BOOLEAN) AS direct_within_bound
             |FROM orders
             |ORDER BY o_orderstatus""".stripMargin)),

    // 22. SUPER / PartiQL navigation (SURVEY §2.2 🔴 → done via Variant):
    //     JSON_PARSE into VARIANT, path navigation, serialize back. The
    //     oracle navigates the same JSON with DuckDB's JSON functions.
    QueryDef(
      "q22_super_variant",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(
          """SELECT event_id,
            |       CAST(variant_get(json_parse(props), '$.k') AS BIGINT) AS k_num,
            |       json_serialize(json_parse(props)) AS roundtrip
            |FROM events
            |WHERE CAST(variant_get(json_parse(props), '$.k') AS BIGINT) >= 50
            |ORDER BY event_id""".stripMargin)
      },
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             |       CAST(json(props) AS VARCHAR) AS roundtrip
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
             |ORDER BY event_id""".stripMargin)),

    // 23. PIVOT (Redshift 2022+ SQL surface): orders cross-tabbed by
    //     priority, counts + decimal-exact revenue per cell. Spark runs
    //     native PIVOT; the oracle is the equivalent portable CASE-WHEN
    //     aggregation (missing count cells coalesce to 0 on both sides —
    //     Spark pivots them to NULL, DuckDB COUNT gives 0).
    QueryDef(
      "q23_pivot",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderstatus,
            |       COALESCE(urgent_n, 0L) AS urgent_n, urgent_rev,
            |       COALESCE(high_n, 0L) AS high_n, high_rev
            |FROM (SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders)
            |PIVOT (CAST(COUNT(*) AS BIGINT) AS n,
            |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
            |       FOR o_orderpriority IN ('1-URGENT' AS urgent, '2-HIGH' AS high))
            |ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus,
             |  CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent_n,
             |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS urgent_rev,
             |  CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high_n,
             |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,6)) END) AS DOUBLE) AS high_rev
             |FROM orders
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // 24. MEDIAN as a window function (Redshift allows `MEDIAN(x) OVER
    //     (PARTITION BY k)`; Spark does not) — the documented rewrite
    //     (SURVEY §2.2 window 🔧): exact per-group median once via groupBy,
    //     broadcast-joined back to the rows. One aggregation + a broadcast
    //     — strictly cheaper than a per-row window sort at any scale.
    QueryDef(
      "q24_median_window",
      (s, d) => {
        val l = t(s, d, "lineitem")
        val med = l.groupBy(col("l_returnflag"))
          .agg(expr("median(l_quantity)").as("med_qty"))
        l.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_quantity"))
          .join(broadcast(med), Seq("l_returnflag"))
          .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "med_qty")
          // the synthetic fixture has duplicate (orderkey, linenumber)
          // pairs, so the tie-break must span every column (identical
          // rows are then interchangeable — hash-stable)
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             |       MEDIAN(l_quantity) OVER (PARTITION BY l_returnflag) AS med_qty
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin)),

    // 25. Ordered-set aggregates with WITHIN GROUP (Redshift
    //     PERCENTILE_CONT / PERCENTILE_DISC) — native Spark 4 syntax vs
    //     DuckDB's quantile_cont/quantile_disc.
    QueryDef(
      "q25_within_group",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag,
            |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
            |  percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
            |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50_disc,
            |  CAST(COUNT(*) AS BIGINT) AS n_rows
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_extendedprice, 0.25) AS p25,
             |  quantile_cont(l_extendedprice, 0.75) AS p75,
             |  quantile_disc(l_extendedprice, 0.5) AS p50_disc,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // 25b. approx_percentile scale twin of q25 (VERDICT r4 #4): the exact
    //      WITHIN GROUP ordered-set aggregates buffer every group value —
    //      memory-unsafe under 100× group-cardinality skew; this twin keeps
    //      a bounded sketch per group. Self-certifying gate (VERDICT r15
    //      #5, the q18b pattern): exact percentiles through the
    //      bounded-memory rank path + one TRUE-expected boolean per sketch
    //      value at the OpsSpec 5% bound — full rows+schema+hash gate.
    QueryDef(
      "q25_within_group_approx",
      (s, d) => {
        import graft.ops.PercentileOps.{sortedPercentiles, PSpec}
        val l = t(s, d, "lineitem")
        val approx = l.groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, 0.25, 10000)").as("__a25"),
            expr("approx_percentile(l_extendedprice, 0.75, 10000)").as("__a75"),
            expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("__a50"))
        sortedPercentiles(l, "l_returnflag", Seq(
            PSpec("l_extendedprice", 0.25, "p25"),
            PSpec("l_extendedprice", 0.75, "p75"),
            PSpec("l_extendedprice", 0.5, "p50_disc", disc = true)))
          .join(approx, Seq("l_returnflag"))
          .selectExpr("l_returnflag", "p25", "p75", "p50_disc", "n_rows",
            "abs(__a25 - p25) <= 0.05 * abs(p25) + 1e-9 as p25_within_bound",
            "abs(__a75 - p75) <= 0.05 * abs(p75) + 1e-9 as p75_within_bound",
            "abs(__a50 - p50_disc) <= 0.05 * abs(p50_disc) + 1e-9 as p50_within_bound")
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_extendedprice, 0.25) AS p25,
             |  quantile_cont(l_extendedprice, 0.75) AS p75,
             |  quantile_disc(l_extendedprice, 0.5) AS p50_disc,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  TRUE AS p25_within_bound,
             |  TRUE AS p75_within_bound,
             |  TRUE AS p50_within_bound
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // 26. Date/time battery #2 (Redshift LAST_DAY / ADD_MONTHS /
    //     DATE_PART variants): month-end clamping and ISO week/doy/dow
    //     agreement across engines; dow normalized to Redshift's 0=Sunday.
    QueryDef(
      "q26_datetime2",
      (s, d) => {
        val o = t(s, d, "orders")
        o.selectExpr(
            "o_orderkey",
            "last_day(o_orderdate) as month_end",
            "add_months(o_orderdate, 2) as plus2m",
            "cast(extract(QUARTER FROM o_orderdate) as bigint) as qtr",
            "cast(extract(WEEK FROM o_orderdate) as bigint) as iso_week",
            "cast(extract(DOY FROM o_orderdate) as bigint) as doy",
            "cast(dayofweek(o_orderdate) - 1 as bigint) as dow")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  last_day(o_orderdate) AS month_end,
             |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
             |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // 27. PartiQL UNNEST of a SUPER array (Redshift `FROM t, t.arr AS x`
    //     iterates a SUPER array; `execute_sql.py:77` admits the syntax) →
    //     Spark's `variant_explode` generator via LATERAL VIEW — the last
    //     untested SURVEY §2.2 row. Both engines build the same JSON array
    //     text from events.props, then explode it; the oracle casts it to
    //     BIGINT[] and unnests with explicit ordinality (the driver's
    //     DuckDB has no json_each table function — verified).
    QueryDef(
      "q27_unnest_super",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(
          """WITH base AS (
            |  SELECT event_id,
            |         CAST(json_extract_path_text(props, 'k') AS BIGINT) AS kk
            |  FROM events
            |  WHERE CAST(json_extract_path_text(props, 'k') AS BIGINT) >= 90)
            |SELECT event_id, CAST(p.pos AS BIGINT) AS pos,
            |       CAST(p.value AS BIGINT) AS v
            |FROM base,
            |     LATERAL variant_explode(json_parse(
            |       concat('[', kk, ',', kk + 100, ',', kk * 3, ']'))) AS p
            |ORDER BY event_id, pos""".stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS kk
             |  FROM events
             |  WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90),
             |b2 AS (
             |  SELECT event_id,
             |         CAST(json(concat('[', kk, ',', kk + 100, ',', kk * 3, ']')) AS BIGINT[]) AS lst
             |  FROM base)
             |SELECT event_id, CAST(s.pos AS BIGINT) AS pos, CAST(s.v AS BIGINT) AS v
             |FROM (SELECT event_id,
             |        unnest(list_transform(range(1, len(lst) + 1),
             |          i -> struct_pack(pos := i - 1, v := lst[i]))) AS s
             |      FROM b2)
             |ORDER BY event_id, pos""".stripMargin)),

    // 25c. Bounded-memory EXACT scale twin of q25: the same
    //      PERCENTILE_CONT/DISC results via distributed sort + rank
    //      (graft.ops.PercentileOps) instead of Spark's buffering
    //      ObjectHashAggregate, which holds every group value on one
    //      executor — the 100 TB hot-group OOM. Exact (not approximate),
    //      so it shares q25's full hash oracle; OpsSpec additionally
    //      asserts bit-equality against the buffering aggregate.
    QueryDef(
      "q25_within_group_sorted",
      (s, d) => {
        import graft.ops.PercentileOps.{sortedPercentiles, PSpec}
        sortedPercentiles(t(s, d, "lineitem"), "l_returnflag", Seq(
            PSpec("l_extendedprice", 0.25, "p25"),
            PSpec("l_extendedprice", 0.75, "p75"),
            PSpec("l_extendedprice", 0.5, "p50_disc", disc = true)))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_extendedprice, 0.25) AS p25,
             |  quantile_cont(l_extendedprice, 0.75) AS p75,
             |  quantile_disc(l_extendedprice, 0.5) AS p50_disc,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // 28. Explicit GROUPING SETS (SURVEY §2.2 multi-grouping row): a set
    //     combination no CUBE/ROLLUP expresses — (a,b), (a), (b) without
    //     the grand total. One Expand + one aggregation; grouping_id()
    //     disambiguates the NULL-as-ALL rows exactly as in q08.
    QueryDef(
      "q28_grouping_sets",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT CAST(grouping_id() AS BIGINT) AS gid,
            |       o_orderpriority, o_orderstatus,
            |       COUNT(*) AS n_orders,
            |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
            |FROM orders
            |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
            |                        (o_orderpriority), (o_orderstatus))
            |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
            |         o_orderstatus ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
             |       o_orderpriority, o_orderstatus,
             |       COUNT(*) AS n_orders,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
             |                        (o_orderpriority), (o_orderstatus))
             |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
             |         o_orderstatus ASC NULLS FIRST""".stripMargin)),

    // 29. RANGE value/interval window frames (SURVEY §2.2 frame-spec row):
    //     peers by ORDER-BY value distance, not row position — a numeric
    //     offset frame over o_totalprice and a 30-day interval frame over
    //     o_orderdate. RANGE frames are tie-insensitive, so results are
    //     deterministic without a unique window key; the frame sum goes
    //     through DECIMAL for order-independence.
    QueryDef(
      "q29_range_frame",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey,
            |  CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
            |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            |    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
            |    RANGE BETWEEN 1000.0 PRECEDING AND 500.0 FOLLOWING) AS DOUBLE) AS sum_near,
            |  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
            |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
            |FROM orders ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             |    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             |    RANGE BETWEEN 1000.0 PRECEDING AND 500.0 FOLLOWING) AS DOUBLE) AS sum_near,
             |  CAST(COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
             |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_30d
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // 30. NTILE / PERCENT_RANK / CUME_DIST (the last ungated ranking
    //     functions of SURVEY §2.2). NTILE depends on row position, so the
    //     window orders by a UNIQUE key pair (price, orderkey) for
    //     cross-engine determinism; PERCENT_RANK = (rank-1)/(n-1) and
    //     CUME_DIST = peers/n are exact small-integer divisions — doubles
    //     are bit-identical across engines.
    QueryDef(
      "q30_ntile_dist",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey,
            |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
            |  PERCENT_RANK() OVER w AS pr,
            |  CUME_DIST() OVER w AS cd
            |FROM orders
            |WINDOW w AS (PARTITION BY o_orderpriority
            |             ORDER BY o_totalprice, o_orderkey)
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey,
             |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
             |  PERCENT_RANK() OVER w AS pr,
             |  CUME_DIST() OVER w AS cd
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // 31. PERCENTILE_CONT / PERCENTILE_DISC as window functions — Redshift
    //     allows its ordered-set aggregates with an OVER clause
    //     (reachable via the pass-through, execute_sql.py:77). Same
    //     rewrite as q24's MEDIAN-over: ONE per-key percentile pass + a
    //     broadcast join back, instead of a per-row window that re-buffers
    //     every group per partition. The percentile side runs through the
    //     bounded-memory rank path (PercentileOps — bit-identical to the
    //     buffering aggregate), so NOTHING in this plan holds a group in
    //     memory: rank windows spill, the join side is O(groups). The
    //     GK-bracketed selection tier (sortedPercentiles bracketAccuracy,
    //     r18) was measured here at sf3 and NOT adopted: 13.4 vs 12.4 s
    //     warm — in-process shuffle is free at this scale, so the sketch
    //     CPU cancels the eliminated exchanges; the remaining floor is
    //     the gated 18M-row output sort itself (output volume, sublinear
    //     ~3.5x growth on 30x data in the r18 sweep — adjudicated sound).
    QueryDef(
      "q31_percentile_window",
      (s, d) => {
        import graft.ops.PercentileOps.{sortedPercentiles, PSpec}
        val l = t(s, d, "lineitem")
        val pct = sortedPercentiles(l, "l_returnflag", Seq(
            PSpec("l_extendedprice", 0.25, "p25_price"),
            PSpec("l_extendedprice", 0.75, "p75_price"),
            PSpec("l_quantity", 0.5, "med_qty_disc", disc = true)))
          .drop("n_rows")
        l.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("l_extendedprice"))
          .join(broadcast(pct), Seq("l_returnflag"))
          .selectExpr("l_orderkey", "l_linenumber", "l_returnflag",
            "l_extendedprice", "p25_price", "p75_price", "med_qty_disc")
          // duplicate (orderkey, linenumber) pairs exist in the fixture;
          // remaining ties are full-row-identical → hash-stable
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag",
            "l_extendedprice")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
             |  quantile_cont(l_extendedprice, 0.25) OVER (PARTITION BY l_returnflag) AS p25_price,
             |  quantile_cont(l_extendedprice, 0.75) OVER (PARTITION BY l_returnflag) AS p75_price,
             |  quantile_disc(l_quantity, 0.5) OVER (PARTITION BY l_returnflag) AS med_qty_disc
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_extendedprice""".stripMargin)),

    // 32. UNPIVOT (columns → rows) — the q23 PIVOT's inverse, previously
    //     spec-only; the SQL-standard form runs verbatim in both engines.
    QueryDef(
      "q32_unpivot",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(unpivotSql)
      },
      Some(unpivotSql)),

    // 33. QUALIFY through the dialect REWRITER, oracle-gated end-to-end:
    //     Spark runs the rewriter's subquery-hoist output, DuckDB runs the
    //     SAME original text natively (it parses QUALIFY) — an independent
    //     engine checking the rewrite's semantics, not just DialectSpec's
    //     self-consistency. Top-3 orders per customer, fully tie-broken.
    QueryDef(
      "q33_qualify",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(graft.sql.RedshiftSql.rewrite(qualifySql))
      },
      Some(qualifySql)),

    // 34. CONNECT BY through the dialect rewriter, oracle-gated: a synthetic
    //     decimal-digit hierarchy over customer (parent = id div 10, root =
    //     0) expanded with Redshift's START WITH/CONNECT BY PRIOR on the
    //     Spark side, and an INDEPENDENTLY-written recursive CTE on the
    //     DuckDB side — the fixed point, membership and LEVEL arithmetic of
    //     the rewrite all hash-gated against the other engine.
    QueryDef(
      "q34_connect_by",
      (s, d) => {
        t(s, d, "customer")
          .selectExpr("c_custkey as id",
            "case when c_custkey = 0 then null else c_custkey div 10 end as parent")
          .createOrReplaceTempView("cust_tree")
        s.sql(graft.sql.RedshiftSql.rewrite(
          """SELECT id, parent, level FROM cust_tree
            |START WITH parent IS NULL
            |CONNECT BY PRIOR id = parent
            |ORDER BY id""".stripMargin))
      },
      Some("""WITH RECURSIVE h AS (
             |  SELECT c_custkey AS id,
             |         CASE WHEN c_custkey = 0 THEN NULL
             |              ELSE CAST(c_custkey // 10 AS BIGINT) END AS parent
             |  FROM customer),
             |r AS (
             |  SELECT id, parent, CAST(1 AS BIGINT) AS level FROM h WHERE parent IS NULL
             |  UNION ALL
             |  SELECT c.id, c.parent, p.level + 1 FROM h c JOIN r p ON p.id = c.parent)
             |SELECT id, parent, level FROM r ORDER BY id""".stripMargin)),

    // 35. TO_CHAR date-token translation, oracle-gated: the Spark side
    //     rewrites Redshift TO_CHAR tokens to date_format java patterns;
    //     DuckDB renders the SAME strings through its own strftime %-codes
    //     — an independent formatter agreeing character-for-character.
    QueryDef(
      "q35_to_char",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(graft.sql.RedshiftSql.rewrite(
          """SELECT event_id,
            |  TO_CHAR(ts, 'YYYY-MM-DD') AS d_iso,
            |  TO_CHAR(ts, 'DD Mon YYYY') AS d_mon,
            |  TO_CHAR(ts, 'HH24:MI:SS') AS t_24
            |FROM events ORDER BY event_id""".stripMargin))
      },
      Some("""SELECT event_id,
             |  strftime(ts, '%Y-%m-%d') AS d_iso,
             |  strftime(ts, '%d %b %Y') AS d_mon,
             |  strftime(ts, '%H:%M:%S') AS t_24
             |FROM events ORDER BY event_id""".stripMargin)),

    // 36. 3-arg DATEADD/DATEDIFF with Redshift unit abbreviations, oracle-
    //     gated: the truncation rewrite's boundary-crossing counts vs
    //     DuckDB's native date_diff (which counts crossings exactly like
    //     Redshift), plus a DATEADD round-trip in epoch micros.
    QueryDef(
      "q36_dateadd_diff",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(graft.sql.RedshiftSql.rewrite(
          """SELECT event_id,
            |  DATEDIFF(h, TIMESTAMP '2024-01-01 00:00:00', ts) AS hrs,
            |  DATEDIFF(min, TIMESTAMP '2024-01-01 00:00:00', ts) AS mins,
            |  unix_micros(DATEADD(d, 2, ts)) AS plus2d_us
            |FROM events ORDER BY event_id""".stripMargin))
      },
      Some("""SELECT event_id,
             |  date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
             |            CAST(ts AS TIMESTAMP)) AS hrs,
             |  date_diff('minute', TIMESTAMP '2024-01-01 00:00:00',
             |            CAST(ts AS TIMESTAMP)) AS mins,
             |  epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 2 DAY) AS plus2d_us
             |FROM events ORDER BY event_id""".stripMargin)),

    // 37. Ordered funnel analysis (view → click → purchase): per user, the
    //     first view, the first click strictly AFTER it, the first
    //     purchase strictly after that — conditional-min aggregations
    //     chained through per-user equi joins (each side is one row per
    //     user: broadcast/shuffle-cheap at any scale), never a sequence
    //     scan over raw history.
    QueryDef(
      "q37_funnel",
      (s, d) => {
        val e = t(s, d, "events").select("user_id", "event_type", "ts")
        val users = e.select("user_id").distinct()
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
          .groupBy("user_id").agg(min("ts").as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy("user_id").agg(min("ts").as("t3"))
        users.join(v, Seq("user_id"), "left")
          .join(c.select("user_id", "t2"), Seq("user_id"), "left")
          .join(p.select("user_id", "t3"), Seq("user_id"), "left")
          .selectExpr("user_id",
            """cast(case when t3 is not null then 3
              |          when t2 is not null then 2
              |          when t1 is not null then 1
              |          else 0 end as bigint) as stage""".stripMargin,
            "unix_micros(t1) as t1_us", "unix_micros(t2) as t2_us",
            "unix_micros(t3) as t3_us")
          .orderBy("user_id")
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
             |           WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, MIN(e.ts) AS t2
             |      FROM events e JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
             |p AS (SELECT e.user_id, MIN(e.ts) AS t3
             |      FROM events e JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
             |u AS (SELECT DISTINCT user_id FROM events)
             |SELECT u.user_id,
             |       CAST(CASE WHEN t3 IS NOT NULL THEN 3
             |                 WHEN t2 IS NOT NULL THEN 2
             |                 WHEN t1 IS NOT NULL THEN 1
             |                 ELSE 0 END AS BIGINT) AS stage,
             |       epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us, epoch_us(t3) AS t3_us
             |FROM u LEFT JOIN v ON v.user_id = u.user_id
             |       LEFT JOIN c ON c.user_id = u.user_id
             |       LEFT JOIN p ON p.user_id = u.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // 38. Daily retention cohorts: cohort = day of a user's first event;
    //     one row per (cohort day, day offset) with the distinct returning
    //     users. Two keyed aggregations + one join — the classic warehouse
    //     retention matrix, no self-join explosion.
    QueryDef(
      "q38_retention",
      (s, d) => {
        val e = t(s, d, "events").select("user_id", "ts")
        val first = e.groupBy("user_id")
          .agg(min("ts").as("ft"))
          .selectExpr("user_id", "cast(ft as date) as cd")
        val active = e.selectExpr("user_id", "cast(ts as date) as ad").distinct()
        active.join(first, Seq("user_id"))
          .selectExpr("cd", "cast(datediff(ad, cd) as bigint) as day_off", "user_id")
          .groupBy("cd", "day_off")
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy("cd", "day_off")
      },
      Some("""WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cd
             |           FROM events GROUP BY user_id),
             |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad
             |      FROM events)
             |SELECT cd, CAST(ad - cd AS BIGINT) AS day_off,
             |       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
             |FROM a JOIN f ON f.user_id = a.user_id
             |GROUP BY cd, day_off
             |ORDER BY cd, day_off""".stripMargin)),

    // 39. Winsorization (robust-stats clamp): per-group p05/p95 through
    //     the bounded-memory rank path (PercentileOps — no per-group
    //     buffering), broadcast back, values clamped, decimal-exact sums.
    //     The q18 gate already proves the rank-path percentiles are
    //     bit-equal to DuckDB's QUANTILE_CONT, so the clamped sums gate.
    QueryDef(
      "q39_winsorize",
      (s, d) => {
        import graft.ops.PercentileOps
        val l = t(s, d, "lineitem")
        val pcts = PercentileOps.sortedPercentiles(l, "l_returnflag", Seq(
          PercentileOps.PSpec("l_extendedprice", 0.05, "p05"),
          PercentileOps.PSpec("l_extendedprice", 0.95, "p95")))
          .select("l_returnflag", "p05", "p95")
        l.join(broadcast(pcts), Seq("l_returnflag"))
          .selectExpr("l_returnflag",
            "least(greatest(l_extendedprice, p05), p95) as clipped",
            "cast(l_extendedprice < p05 or l_extendedprice > p95 as int) as is_clip")
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("clipped")).as("sum_winsor"),
            sum(col("is_clip")).cast("long").as("n_clipped"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH p AS (SELECT l_returnflag,
             |    QUANTILE_CONT(l_extendedprice, 0.05) AS p05,
             |    QUANTILE_CONT(l_extendedprice, 0.95) AS p95
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l.l_returnflag,
             |  CAST(SUM(CAST(least(greatest(l_extendedprice, p05), p95) AS DECIMAL(18,6))) AS DOUBLE) AS sum_winsor,
             |  CAST(SUM(CASE WHEN l_extendedprice < p05 OR l_extendedprice > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
             |  COUNT(*) AS n_rows
             |FROM lineitem l JOIN p ON p.l_returnflag = l.l_returnflag
             |GROUP BY l.l_returnflag
             |ORDER BY l.l_returnflag""".stripMargin)),

    // 40. Calendar gap-filling: per user, a complete daily spine from
    //     first to last activity (explode(sequence(date, date)) — a
    //     generator, not a driver loop), zeros on silent days, running
    //     cumulative. The standard time-series densification Redshift
    //     does with a calendar table join.
    QueryDef(
      "q40_gapfill",
      (s, d) => {
        val e = t(s, d, "events").selectExpr("user_id", "cast(ts as date) as dt")
        val perDay = e.groupBy("user_id", "dt").agg(count(lit(1)).as("n0"))
        val spine = e.groupBy(col("user_id"))
          .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
          .selectExpr("user_id", "explode(sequence(d0, d1)) as dt")
        val w = Window.partitionBy(col("user_id")).orderBy(col("dt"))
        spine.join(perDay, Seq("user_id", "dt"), "left")
          .selectExpr("user_id", "dt", "cast(coalesce(n0, 0) as bigint) as n_events")
          .withColumn("cum_events", sum(col("n_events")).over(w))
          .orderBy(col("user_id"), col("dt"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS dt FROM events),
             |pd AS (SELECT user_id, dt, COUNT(*) AS n0 FROM e GROUP BY user_id, dt),
             |sp AS (SELECT user_id,
             |         CAST(unnest(generate_series(MIN(dt), MAX(dt), INTERVAL 1 DAY)) AS DATE) AS dt
             |       FROM e GROUP BY user_id)
             |SELECT sp.user_id, sp.dt,
             |       CAST(COALESCE(pd.n0, 0) AS BIGINT) AS n_events,
             |       CAST(SUM(COALESCE(pd.n0, 0)) OVER (PARTITION BY sp.user_id
             |         ORDER BY sp.dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
             |FROM sp LEFT JOIN pd ON pd.user_id = sp.user_id AND pd.dt = sp.dt
             |ORDER BY sp.user_id, sp.dt""".stripMargin)),

    // 41. Market-basket co-occurrence: part pairs appearing in the same
    //     order, min support 3. The self-join is keyed on l_orderkey and
    //     bounded by the per-order item count (TPC-H ≈ 4), so the pair
    //     blow-up is per-key quadratic in a SMALL constant — never a
    //     corpus cartesian; support counting is a keyed two-phase agg.
    QueryDef(
      "q41_basket_pairs",
      (s, d) => {
        val l = t(s, d, "lineitem").select("l_orderkey", "l_partkey").distinct()
        val a = l.toDF("o", "pa")
        val b = l.toDF("o", "pb")
        a.join(b, Seq("o")).filter(col("pa") < col("pb"))
          .groupBy(col("pa"), col("pb"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 3)
          .orderBy(col("pa"), col("pb"))
      },
      Some("""WITH i AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
             |SELECT a.p AS pa, b.p AS pb, COUNT(*) AS support
             |FROM i a JOIN i b ON a.o = b.o AND a.p < b.p
             |GROUP BY a.p, b.p HAVING COUNT(*) >= 3
             |ORDER BY pa, pb""".stripMargin)),

    // 42. Clickstream transition bigrams: (previous event_type → next)
    //     counts per user stream in timestamp order — LAG over the
    //     (user_id)-keyed window (one shuffle), then a keyed count.
    //     event_id breaks timestamp ties deterministically in both engines.
    QueryDef(
      "q42_event_paths",
      (s, d) => {
        val e = t(s, d, "events").select("user_id", "event_type", "ts", "event_id")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("prev"), col("next"))
      },
      Some("""WITH g AS (SELECT user_id, event_type,
             |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events)
             |SELECT prev, event_type AS next, COUNT(*) AS n
             |FROM g WHERE prev IS NOT NULL
             |GROUP BY prev, next
             |ORDER BY prev, next""".stripMargin)),

    // 43. IGNORE NULLS window modifier (LOCF carry-forward): value is
    //     NULLed on error events, then last-observation-carried-forward
    //     per user stream — LAST_VALUE … IGNORE NULLS over the running
    //     frame, the one window modifier not covered by q09/q10/q29/q30.
    //     Same SQL text runs in both engines.
    QueryDef(
      "q43_locf",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(
          """SELECT user_id, event_id,
            |  LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END) IGNORE NULLS
            |    OVER (PARTITION BY user_id ORDER BY ts, event_id
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
            |FROM events
            |ORDER BY user_id, event_id""".stripMargin)
      },
      Some("""SELECT user_id, event_id,
             |  LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
             |FROM events
             |ORDER BY user_id, event_id""".stripMargin)),

    // 44. Value-range window frame (RANGE BETWEEN INTERVAL): per-customer
    //     rolling 30-day spend — the frame is defined by the ORDER BY
    //     VALUE, not row offsets, so same-day peers always enter together
    //     (the semantics ROWS cannot express). Sum accumulates in
    //     DECIMAL, so the set-valued frame is order-independent and the
    //     result exact cross-engine. Same SQL text runs in both engines.
    QueryDef(
      "q44_range_frame",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_custkey, o_orderkey,
            |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
            |    PARTITION BY o_custkey ORDER BY o_orderdate
            |    RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW)
            |    AS DOUBLE) AS roll30
            |FROM orders
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate
             |    RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW)
             |    AS DOUBLE) AS roll30
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // 45. BOOL_AND / BOOL_OR / BIT_AND / BIT_OR — the Redshift boolean
    //     and bitwise aggregate battery (same names in Spark and DuckDB;
    //     all exact integer/boolean arithmetic, so the gate is direct).
    QueryDef(
      "q45_bool_bit_aggs",
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag,
            |  BOOL_AND(l_quantity > 1) AS all_multi,
            |  BOOL_OR(l_discount > 0.09) AS any_deep_disc,
            |  BIT_AND(CAST(l_linenumber AS BIGINT)) AS lines_band,
            |  BIT_OR(CAST(l_linenumber AS BIGINT)) AS lines_bor
            |FROM lineitem
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  BOOL_AND(l_quantity > 1) AS all_multi,
             |  BOOL_OR(l_discount > 0.09) AS any_deep_disc,
             |  BIT_AND(CAST(l_linenumber AS BIGINT)) AS lines_band,
             |  BIT_OR(CAST(l_linenumber AS BIGINT)) AS lines_bor
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // 46. Ranking-function battery: DENSE_RANK (over a low-cardinality
    //     key, so ties are exercised), PERCENT_RANK and CUME_DIST (both
    //     tie-stable rationals — one exact division each), and NTILE
    //     (row-order-dependent, so its ORDER BY carries a unique
    //     tiebreaker). Casts pin the integer ranks to BIGINT in both
    //     engines. Same SQL text runs in both.
    QueryDef(
      "q46_rank_battery",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_custkey, o_orderkey,
            |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS status_rank,
            |  CAST(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS DOUBLE) AS price_prank,
            |  CAST(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS DOUBLE) AS price_cume,
            |  CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile
            |FROM orders
            |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS status_rank,
             |  CAST(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS DOUBLE) AS price_prank,
             |  CAST(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS DOUBLE) AS price_cume,
             |  CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    // 47. GROUPING() under ROLLUP — distinguishing "aggregated away"
    //     from "genuinely NULL" is the whole point of the function, and
    //     the NULLS LAST pins make the subtotal rows sort identically in
    //     both engines (their ASC null defaults differ).
    QueryDef(
      "q47_grouping_fn",
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderpriority, o_orderstatus,
            |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
            |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
            |  COUNT(*) AS n
            |FROM orders
            |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
            |ORDER BY o_orderpriority NULLS LAST, o_orderstatus NULLS LAST""".stripMargin)
      },
      Some("""SELECT o_orderpriority, o_orderstatus,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
             |  COUNT(*) AS n
             |FROM orders
             |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
             |ORDER BY o_orderpriority NULLS LAST, o_orderstatus NULLS LAST""".stripMargin)),

    // 48. Last-touch attribution: each purchase credits the most recent
    //     PRECEDING non-purchase event of the same user (the marketing
    //     warehouse query par excellence) — LAST_VALUE … IGNORE NULLS
    //     over an UNBOUNDED..1 PRECEDING frame, i.e. q43's carry-forward
    //     shifted to exclude the current row. Attributed value sums in
    //     DECIMAL (order-independent), then one cast out. Purchases with
    //     no prior touch (first event of a user) drop, as in the
    //     standard attribution model. Spark puts IGNORE NULLS after the
    //     call, DuckDB inside the parens — same semantics (gated by q43).
    QueryDef(
      "q48_attribution",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(
          """WITH a AS (SELECT user_id, event_type, value,
            |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END) IGNORE NULLS
            |      OVER (PARTITION BY user_id ORDER BY ts, event_id
            |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
            |  FROM events)
            |SELECT channel, COUNT(*) AS conversions,
            |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
            |FROM a
            |WHERE event_type = 'purchase' AND channel IS NOT NULL
            |GROUP BY channel
            |ORDER BY channel""".stripMargin)
      },
      Some("""WITH a AS (SELECT user_id, event_type, value,
             |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
             |  FROM events)
             |SELECT channel, COUNT(*) AS conversions,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
             |FROM a
             |WHERE event_type = 'purchase' AND channel IS NOT NULL
             |GROUP BY channel
             |ORDER BY channel""".stripMargin)),

    // 49. Welch's t over every event-type pair — the A/B-test readout.
    //     Values quantize to 1/128 grid (floor — exact IEEE), moments are
    //     exact BIGINT sums (order-independent, map-side combinable), and
    //     mean/variance/t are ONE fixed-order double formula over those
    //     sums, so the whole statistic hash-gates cross-engine (t is
    //     invariant under the affine quantization up to the documented
    //     1/128 grid). The pair join is a 5-row broadcast theta join.
    //     Same SQL text runs in both engines.
    QueryDef(
      "q49_welch_ttest",
      (s, d) => {
        t(s, d, "events").createOrReplaceTempView("events")
        s.sql(welchSql)
      },
      Some(welchSql)),

    // 50. Redshift date-function battery not covered by q14/q26/q35/q36:
    //     ADD_MONTHS (end-of-month clamping), MONTHS_BETWEEN (the
    //     31-day-month fractional rule, roundOff OFF so the IEEE value is
    //     a single divide+add both engines reproduce exactly), LAST_DAY,
    //     NEXT_DAY (strictly-later semantics), TRUNC to quarter, and the
    //     dow/doy/iso-week extracts. DuckDB expresses each via its own
    //     calendar primitives — two independent implementations of the
    //     same published semantics.
    QueryDef(
      "q50_date_battery",
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("od", col("o_orderdate").cast("date"))
        o.select(
            col("o_orderkey"),
            add_months(col("od"), 1).as("plus_month"),
            add_months(col("od"), -3).as("minus_q"),
            months_between(lit("1998-12-31").cast("date"),
              col("od"), roundOff = false).as("mb"),
            last_day(col("od")).as("eom"),
            next_day(col("od"), "Friday").as("next_fri"),
            trunc(col("od"), "quarter").as("q_start"),
            dayofweek(col("od")).cast("long").as("dow1"),
            dayofyear(col("od")).cast("long").as("doy"),
            weekofyear(col("od")).cast("long").as("iso_week"),
            quarter(col("od")).cast("long").as("qtr"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH d AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
             |SELECT o_orderkey,
             |  CAST(od + INTERVAL 1 MONTH AS DATE) AS plus_month,
             |  CAST(od - INTERVAL 3 MONTH AS DATE) AS minus_q,
             |  CASE WHEN day(DATE '1998-12-31') = day(od)
             |         OR od = last_day(od)
             |       THEN CAST(date_diff('month', od, DATE '1998-12-31') AS DOUBLE)
             |       ELSE CAST(date_diff('month', od, DATE '1998-12-31') AS DOUBLE)
             |            + (day(DATE '1998-12-31') - day(od)) / 31.0 END AS mb,
             |  last_day(od) AS eom,
             |  od + CAST(CASE WHEN (12 - dayofweek(od)) % 7 = 0
             |         THEN 7 ELSE (12 - dayofweek(od)) % 7 END AS INT) AS next_fri,
             |  CAST(date_trunc('quarter', od) AS DATE) AS q_start,
             |  CAST(dayofweek(od) + 1 AS BIGINT) AS dow1,
             |  CAST(dayofyear(od) AS BIGINT) AS doy,
             |  CAST(weekofyear(od) AS BIGINT) AS iso_week,
             |  CAST(quarter(od) AS BIGINT) AS qtr
             |FROM d ORDER BY o_orderkey""".stripMargin)),

    // 51. Redshift string-function battery beyond q14: TRANSLATE, REPEAT,
    //     INITCAP (DuckDB mirrors Spark's space-delimited title rule
    //     explicitly), REVERSE, CHARINDEX/STRPOS, BTRIM with a char set,
    //     ASCII, CHR, CONCAT_WS, LEFT/RIGHT, OCTET_LENGTH, MD5,
    //     REGEXP_COUNT, and STRTOL base-16 (conv vs hex-literal cast).
    QueryDef(
      "q51_string_battery2",
      (s, d) => {
        val doc = t(s, d, "documents")
          .withColumn("sx", expr("substring(text, 1, 120)"))
        doc.select(
            col("doc_id"),
            translate(col("sx"), "aeiou", "#####").as("xlate"),
            repeat(col("lang"), 3).as("lang3"),
            // whitespace normalized on BOTH sides first: Spark's initcap
            // delimits on any whitespace, the DuckDB mirror splits on ' '
            // only — a tab/newline in the slice would diverge (ADVICE r10)
            initcap(regexp_replace(col("sx"), "\\s", " ")).as("title"),
            reverse(col("lang")).as("rev_lang"),
            instr(col("sx"), "the").cast("long").as("pos_the"),
            expr("btrim(sx, 'aeiou ')").as("trimmed"),
            ascii(col("lang")).cast("long").as("lang_ascii"),
            expr("chr(65 + doc_id % 26)").as("key_chr"),
            concat_ws("|", col("lang"), col("source")).as("joined"),
            expr("left(sx, 6)").as("head6"),
            expr("right(sx, 6)").as("tail6"),
            octet_length(col("sx")).cast("long").as("octets"),
            md5(col("sx")).as("sig"),
            expr("cast(regexp_count(sx, '[aeiou]') as bigint)").as("vowels"),
            expr("cast(conv(substring(md5(sx), 1, 8), 16, 10) as bigint)").as("strtol16"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, source, substr(text, 1, 120) AS sx FROM documents)
             |SELECT doc_id,
             |  translate(sx, 'aeiou', '#####') AS xlate,
             |  repeat(lang, 3) AS lang3,
             |  array_to_string(list_transform(
             |    string_split(lower(regexp_replace(sx, '\s', ' ', 'g')), ' '),
             |    w -> upper(substr(w, 1, 1)) || substr(w, 2, len(w))), ' ') AS title,
             |  reverse(lang) AS rev_lang,
             |  CAST(strpos(sx, 'the') AS BIGINT) AS pos_the,
             |  trim(sx, 'aeiou ') AS trimmed,
             |  CAST(ascii(lang) AS BIGINT) AS lang_ascii,
             |  chr(CAST(65 + doc_id % 26 AS INT)) AS key_chr,
             |  concat_ws('|', lang, source) AS joined,
             |  left(sx, 6) AS head6,
             |  right(sx, 6) AS tail6,
             |  CAST(strlen(sx) AS BIGINT) AS octets,
             |  md5(sx) AS sig,
             |  CAST(len(regexp_extract_all(sx, '[aeiou]')) AS BIGINT) AS vowels,
             |  CAST('0x' || substr(md5(sx), 1, 8) AS BIGINT) AS strtol16
             |FROM d ORDER BY doc_id""".stripMargin))
  )

  private lazy val welchSql: String =
    """WITH q AS (SELECT event_type, CAST(FLOOR(value * 128.0) AS BIGINT) AS v
      |           FROM events),
      |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(SUM(v) AS BIGINT) AS s1, CAST(SUM(v * v) AS BIGINT) AS s2
      |      FROM q GROUP BY event_type),
      |m AS (SELECT event_type, n,
      |        CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 128.0 AS mean,
      |        (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 16384.0 AS vr
      |      FROM s)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
      |  (a.mean - b.mean)
      |    / sqrt(a.vr / CAST(a.n AS DOUBLE) + b.vr / CAST(b.n AS DOUBLE)) AS welch_t
      |FROM m a JOIN m b ON a.event_type < b.event_type
      |ORDER BY type_a, type_b""".stripMargin
}
