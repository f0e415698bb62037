package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Everything is derived from one `Seq[QueryDef]` registry so a query's
  * Spark implementation and its DuckDB oracle can never drift apart
  * (names, presence, pairing are all single-sourced).
  */
object SparkEntry {
  /** All gated operators: the t2 SQL corpus + LLM-pipeline ops. */
  def registry: Seq[QueryDef] =
    graft.queries.T2.defs ++ graft.ops.OpQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_join_chain")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
