package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader for the driver-generated parquet tables
  * (`/root/repo/TESTDATA.md`, `/root/repo/FIXTURES.md`).
  *
  * The reference engine's only local storage format is headered CSV read in
  * 10k-row pandas chunks (`/root/reference/amazonredshift_blueprints/blueprints/upload_file.py:120,126`);
  * here Parquet fixtures stand in for the remote Redshift tables, registered
  * as temp views so the pass-through SQL surface (`execute_sql.py:64,77`)
  * maps onto `spark.sql`.
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = relational ++ Seq("events", "documents", "embeddings")

  /** Load one fixture table.  `events.ts` is parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects at schema conversion unless read as a raw Long
    * (`spark.sql.legacy.parquet.nanosAsLong`); we convert ns → µs with
    * integer division (floor for positive epochs, matching DuckDB's
    * TIMESTAMP_NS → TIMESTAMP truncation) and expose a proper timestamp.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // nanosAsLong must already be set on the session (GraftSession and
      // every main set it at build time; mutating conf here would leak a
      // session-wide side effect into later parquet reads).
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "events.parquet is TIMESTAMP(NANOS): build the session with " +
          "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession does)")
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
