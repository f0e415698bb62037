package graft.sql

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Redshift system-catalog shims (SURVEY §2.2 pass-through edge;
  * VERDICT r4 gap #3): `pg_table_def` and `svv_table_info` as generated
  * temp views over the Spark catalog, so the introspection queries the
  * store blueprint commonly exports (`store_query_results.py:132` forwards
  * arbitrary SQL) resolve locally instead of failing with TABLE_NOT_FOUND.
  *
  * Column subsets follow the public Redshift docs; values map onto Spark's
  * layout concepts the same way the DDL rewriter does in reverse
  * ([[RedshiftSql]] maps DISTKEY/SORTKEY → bucket/sort columns, so the
  * shims report bucket/sort columns back AS distkey/sortkey):
  *
  *   pg_table_def(schemaname, tablename, column, type, encoding, distkey,
  *                sortkey, notnull)
  *   svv_table_info(database, schema, table, encoded, diststyle, sortkey1,
  *                  sortkey_num, size, tbl_rows)
  *
  * `size` (MB) and `tbl_rows` come from catalog statistics — NULL until
  * ANALYZE runs (Redshift's svv also lags until its auto-analyze). Views
  * are re-generated on every ensure() call: a catalog snapshot must not go
  * stale between DDL statements.
  */
object CatalogShims {

  private val shimNames =
    Seq("pg_table_def", "svv_table_info", "__info_schema_")

  /** Re-register the shim views iff `sql` references one of them. */
  def ensure(spark: SparkSession, sql: String): Unit = {
    val lower = sql.toLowerCase
    if (shimNames.exists(lower.contains)) register(spark)
  }

  /** Redshift type text for a Spark type (SURVEY §1.2 mapping, reversed). */
  private def redshiftType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "integer"
    case ShortType => "smallint"
    case ByteType => "smallint"
    case DoubleType => "double precision"
    case FloatType => "real"
    case StringType => "character varying(65535)"
    case BooleanType => "boolean"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp without time zone"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case BinaryType => "varbyte(1024000)"
    case other => other.sql.toLowerCase // SUPER/arrays: no 1:1 Redshift name
  }

  def register(spark: SparkSession): Unit = {
    val cat = spark.sessionState.catalog
    val db = cat.getCurrentDatabase
    val metas = cat.listTables(db).flatMap(ti =>
      scala.util.Try(cat.getTableMetadata(ti)).toOption)

    val pgRows = metas.flatMap { m =>
      val bucketCols = m.bucketSpec.map(_.bucketColumnNames.map(_.toLowerCase))
        .getOrElse(Nil)
      val sortCols = m.bucketSpec.map(_.sortColumnNames.map(_.toLowerCase))
        .getOrElse(Nil)
      m.schema.fields.map { f =>
        Row(
          m.identifier.database.getOrElse(db),
          m.identifier.table,
          f.name,
          redshiftType(f.dataType),
          "none",
          bucketCols.contains(f.name.toLowerCase),
          sortCols.indexOf(f.name.toLowerCase) + 1, // 1-based; 0 = not a sortkey
          !f.nullable)
      }
    }
    val pgSchema = StructType(Seq(
      StructField("schemaname", StringType),
      StructField("tablename", StringType),
      StructField("column", StringType),
      StructField("type", StringType),
      StructField("encoding", StringType),
      StructField("distkey", BooleanType),
      StructField("sortkey", IntegerType),
      StructField("notnull", BooleanType)))
    spark.createDataFrame(pgRows.asJava, pgSchema)
      .createOrReplaceTempView("pg_table_def")

    val infoRows = metas.map { m =>
      val sortCols = m.bucketSpec.map(_.sortColumnNames).getOrElse(Nil)
      Row(
        db,
        m.identifier.database.getOrElse(db),
        m.identifier.table,
        "N", // Spark chooses parquet encodings at write time, not in DDL
        m.bucketSpec.map(bs => s"KEY(${bs.bucketColumnNames.head})")
          .getOrElse("EVEN"),
        sortCols.headOption.orNull,
        sortCols.length,
        m.stats.map(s => (s.sizeInBytes / (1L << 20)).toLong.max(1L))
          .map(Long.box).orNull,
        m.stats.flatMap(_.rowCount).map(r => Long.box(r.toLong)).orNull)
    }
    val infoSchema = StructType(Seq(
      StructField("database", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("encoded", StringType),
      StructField("diststyle", StringType),
      StructField("sortkey1", StringType),
      StructField("sortkey_num", IntegerType),
      StructField("size", LongType),
      StructField("tbl_rows", LongType)))
    spark.createDataFrame(infoRows.asJava, infoSchema)
      .createOrReplaceTempView("svv_table_info")

    // information_schema.tables / .columns (standard core columns) over
    // EVERY database — the rewriter folds the qualified names into these
    // flat view names (temp views cannot live in a schema)
    val allMetas = cat.listDatabases().flatMap(d =>
      cat.listTables(d).flatMap(ti =>
        scala.util.Try(cat.getTableMetadata(ti)).toOption))
    val tableRows = allMetas.map { m =>
      Row(
        "graft",
        m.identifier.database.getOrElse(db),
        m.identifier.table,
        if (m.tableType.name == "VIEW") "VIEW" else "BASE TABLE")
    }
    val tablesSchema = StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("table_type", StringType)))
    spark.createDataFrame(tableRows.asJava, tablesSchema)
      .createOrReplaceTempView("__info_schema_tables")

    val columnRows = allMetas.flatMap { m =>
      m.schema.fields.zipWithIndex.map { case (f, idx) =>
        Row(
          "graft",
          m.identifier.database.getOrElse(db),
          m.identifier.table,
          f.name,
          idx + 1,
          if (f.nullable) "YES" else "NO",
          redshiftType(f.dataType))
      }
    }
    val columnsSchema = StructType(Seq(
      StructField("table_catalog", StringType),
      StructField("table_schema", StringType),
      StructField("table_name", StringType),
      StructField("column_name", StringType),
      StructField("ordinal_position", IntegerType),
      StructField("is_nullable", StringType),
      StructField("data_type", StringType)))
    spark.createDataFrame(columnRows.asJava, columnsSchema)
      .createOrReplaceTempView("__info_schema_columns")
  }
}
