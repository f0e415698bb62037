package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

import SqlTokens._

/** Local COPY / UNLOAD emulation for the `execute_sql` pass-through
  * (SURVEY §2.2 "CTEs, DDL, DML" — `COPY … FROM` / `UNLOAD` map to the
  * blueprint A1/A8 semantics; the reference's own COPY substitute IS the
  * upload blueprint, `upload_file.py:118-155`, and UNLOAD's is the store
  * blueprint, `store_query_results.py:98-118`). A Redshift user's two most
  * common non-query statements thus execute locally instead of failing at
  * the Spark parser; with a remote connection the statements still pass
  * through verbatim over JDBC (ExecuteSql's remote branch).
  *
  * Grammar handled (tokenized; Redshift auth/region/compression options
  * are skipped — Spark's Hadoop FS layer owns transport and decompression;
  * on a real cluster an `s3a://` path reads exactly like the local paths
  * used in tests):
  *   COPY <table> [(cols)] FROM '<path>'
  *        [FORMAT] [AS] [CSV] [DELIMITER [AS] '<d>'] [IGNOREHEADER [AS] n]
  *   UNLOAD ('<query>') TO '<path>'
  *        [FORMAT] [AS] [CSV] [DELIMITER [AS] '<d>'] [HEADER]
  *        [PARALLEL ON|OFF|TRUE|FALSE]
  *
  * Semantics follow Redshift where they matter:
  *  - COPY appends into an EXISTING table and takes its types from the
  *    target schema (no inference drift between loads);
  *  - the default delimiter is '|' (Redshift's text format), ',' under CSV;
  *  - a COPY column list loads those columns and fills the rest with NULL;
  *  - UNLOAD defaults to a parallel directory of part files (the 100 TB
  *    path); PARALLEL OFF produces the single-file contract via
  *    [[graft.io.CsvIO.write]].
  */
object LocalCopy {

  /** Runs `sql` as emulated local COPY/UNLOAD; false when it is neither
    * (caller falls back to `spark.sql`). */
  def run(spark: SparkSession, sql: String): Boolean = {
    val toks = tokenize(sql)
    val first = nextCode(toks, 0)
    if (first >= toks.length) return false
    if (toks(first).isWord("copy")) { runCopy(spark, toks, first); true }
    else if (toks(first).isWord("unload")) { runUnload(spark, toks, first); true }
    else false
  }

  private def unquote(s: String): String =
    s.stripPrefix("'").stripSuffix("'").replace("''", "'")

  /** COPY/UNLOAD format words whose data would be misparsed as delimited
    * text if silently skipped like the auth/transport options. */
  private val unsupportedFormats =
    Set("json", "avro", "parquet", "orc", "fixedwidth", "shapefile")

  private def runCopy(spark: SparkSession, toks: Vector[Tok], at: Int): Unit = {
    val (table, afterTable) = qualifiedName(toks, at + 1)
    var i = nextCode(toks, afterTable)
    // optional (col, col, ...) list
    val cols: Seq[String] =
      if (i < toks.length && toks(i).kind == Sym && toks(i).text == "(") {
        val (names, close) = nameList(toks, i)
        i = nextCode(toks, close + 1)
        names
      } else Seq.empty
    require(i < toks.length && toks(i).isWord("from"), "COPY needs FROM '<path>'")
    i = nextCode(toks, i + 1)
    require(i < toks.length && toks(i).kind == Str, "COPY FROM needs a quoted path")
    val path = unquote(toks(i).text)
    // option scan: csv / delimiter / ignoreheader; everything else skipped
    var isCsv = false
    var delim: Option[String] = None
    var headerRows = 0
    var j = nextCode(toks, i + 1)
    while (j < toks.length) {
      val t = toks(j)
      if (t.isWord("csv")) isCsv = true
      else if (unsupportedFormats.contains(t.text.toLowerCase) && t.kind == Word)
        // skipping these would silently load the file as delimited text —
        // fail loudly instead (only CSV / delimited text are implemented)
        throw new IllegalArgumentException(
          s"COPY: format '${t.text}' is not supported (CSV/delimited text only)")
      else if (t.isWord("delimiter")) {
        var k = nextCode(toks, j + 1)
        if (k < toks.length && toks(k).isWord("as")) k = nextCode(toks, k + 1)
        require(k < toks.length && toks(k).kind == Str, "DELIMITER needs a quoted char")
        delim = Some(unquote(toks(k).text)); j = k
      } else if (t.isWord("ignoreheader")) {
        var k = nextCode(toks, j + 1)
        if (k < toks.length && toks(k).isWord("as")) k = nextCode(toks, k + 1)
        require(k < toks.length && toks(k).kind == Num, "IGNOREHEADER needs a number")
        headerRows = toks(k).text.toInt; j = k
        // Spark's header option skips exactly one line per file; silently
        // loading the remaining header lines as data would corrupt the table
        require(headerRows <= 1, "COPY: IGNOREHEADER > 1 is not supported")
      }
      j = nextCode(toks, j + 1)
    }
    require(spark.catalog.tableExists(table), s"COPY target $table does not exist")
    val target = spark.table(table)
    val loadCols = if (cols.nonEmpty) cols else target.schema.fieldNames.toSeq
    val loadSchema = org.apache.spark.sql.types.StructType(
      loadCols.map(c => target.schema(target.schema.fieldIndex(c))))
    val read = spark.read
      .schema(loadSchema)
      .option("header", headerRows > 0)
      .option("sep", delim.getOrElse(if (isCsv) "," else "|"))
      .csv(path)
    // fill unlisted columns with typed NULLs, in target column order
    val full = target.schema.fields.map { f =>
      if (loadCols.contains(f.name)) col(f.name)
      else expr(s"CAST(NULL AS ${f.dataType.sql})").as(f.name)
    }
    read.select(full.toSeq: _*).write.mode("append")
      .saveAsTable(table)
  }

  private def runUnload(spark: SparkSession, toks: Vector[Tok], at: Int): Unit = {
    var i = nextCode(toks, at + 1)
    require(i < toks.length && toks(i).kind == Sym && toks(i).text == "(",
      "UNLOAD needs ('<query>')")
    val close = matchParen(toks, i)
    val inner = toks.slice(i + 1, close).filter(_.kind == Str)
    require(inner.length == 1, "UNLOAD needs exactly one quoted query")
    val query = unquote(inner.head.text)
    i = nextCode(toks, close + 1)
    require(i < toks.length && toks(i).isWord("to"), "UNLOAD needs TO '<path>'")
    i = nextCode(toks, i + 1)
    require(i < toks.length && toks(i).kind == Str, "UNLOAD TO needs a quoted path")
    val path = unquote(toks(i).text)
    var isCsv = false
    var delim: Option[String] = None
    var header = false
    var parallel = true // Redshift default: one file per slice
    var partitionCols: Seq[String] = Seq.empty
    var j = nextCode(toks, i + 1)
    while (j < toks.length) {
      val t = toks(j)
      if (t.isWord("csv")) isCsv = true
      else if (t.kind == Word && unsupportedFormats.contains(t.text.toLowerCase))
        throw new IllegalArgumentException(
          s"UNLOAD: format '${t.text}' is not supported (CSV/delimited text only)")
      else if (t.isWord("partition")) {
        val by = nextCode(toks, j + 1)
        require(by < toks.length && toks(by).isWord("by"), "PARTITION needs BY (cols)")
        val open = nextCode(toks, by + 1)
        val (cols, close) = nameList(toks, open)
        partitionCols = cols
        j = close
      } else if (t.isWord("include"))
        // Spark's partitionBy encodes the columns in the path and excludes
        // them from data files (Redshift's default); duplicating them would
        // silently change the file schema
        throw new IllegalArgumentException(
          "UNLOAD: PARTITION BY ... INCLUDE is not supported")
      else if (t.isWord("header")) header = true
      else if (t.isWord("delimiter")) {
        var k = nextCode(toks, j + 1)
        if (k < toks.length && toks(k).isWord("as")) k = nextCode(toks, k + 1)
        require(k < toks.length && toks(k).kind == Str, "DELIMITER needs a quoted char")
        delim = Some(unquote(toks(k).text)); j = k
      } else if (t.isWord("parallel")) {
        val k = nextCode(toks, j + 1)
        if (k < toks.length && (toks(k).isWord("off") || toks(k).isWord("false"))) {
          parallel = false; j = k
        } else if (k < toks.length && (toks(k).isWord("on") || toks(k).isWord("true"))) {
          j = k
        }
      }
      j = nextCode(toks, j + 1)
    }
    val df = spark.sql(RedshiftSql.rewrite(query))
    val sep = delim.getOrElse(if (isCsv) "," else "|")
    if (partitionCols.nonEmpty) {
      // partitioned export: one directory per key prefix — Spark's
      // partitionBy is exactly Redshift's PARTITION BY layout
      require(parallel, "UNLOAD: PARTITION BY cannot be combined with PARALLEL OFF")
      df.write.mode("overwrite").option("header", header).option("sep", sep)
        .partitionBy(partitionCols: _*).csv(path)
    } else
      // PARALLEL ON (Redshift's default) → a directory of part files;
      // PARALLEL OFF → the blueprint single-file contract (CsvIO owns the
      // spill-and-move, including the empty-result empty-file case)
      graft.io.CsvIO.write(df, path, header = header,
        singleFile = !parallel, sep = sep)
  }
}
