package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gated operator: a Spark-first implementation plus (when the semantics
  * are SQL-expressible) an equivalent DuckDB oracle query the driver
  * hash-compares against at sf0.01.
  *
  * Canonicalization rules shared by both sides (SURVEY.md §5.2, §7.4.5-6):
  *   - explicit total-order ORDER BY (unique tie-break key) in both engines;
  *   - double aggregation goes through DECIMAL casts (`SUM(CAST(x AS
  *     DECIMAL(18,4)))`) so the result is independent of addition order,
  *     then back to DOUBLE for a stable schema;
  *   - no raw TIMESTAMP columns in outputs (epoch micros or DATE instead);
  *   - integral aggregates cast to BIGINT on the oracle side (DuckDB's
  *     SUM(BIGINT) is HUGEINT);
  *   - column names aliased identically in both engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
