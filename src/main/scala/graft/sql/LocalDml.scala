package graft.sql

import org.apache.spark.sql.SparkSession

import SqlTokens._

/** Local UPDATE / DELETE emulation for session-catalog tables (SURVEY §2.2
  * DML 🔴): vanilla parquet tables have no row-level mutation, so the
  * statement is rewritten into a copy-on-write swap — materialize the new
  * table contents with CTAS (fully executed before anything is dropped),
  * then DROP + RENAME. Logically the same mechanism ACID table formats use
  * per-file; here the unit is the whole table, which is the honest contract
  * for format-agnostic parquet. Remote (JDBC) DML keeps going through the
  * raw-statement pass-through in [[graft.cli.ExecuteSql]], matching the
  * reference (`execute_sql.py:64,77`).
  *
  * Grammar handled (tokenized — literals/comments never corrupted):
  *   UPDATE <table> SET col = expr [, col = expr]* [WHERE pred]
  *   DELETE FROM <table> [WHERE pred]
  * MERGE stays deferred (documented).
  */
object LocalDml {

  /** Runs `sql` as emulated local DML if it is an UPDATE/DELETE statement;
    * returns false when the statement is not DML (caller falls back to
    * `spark.sql`). */
  def run(spark: SparkSession, sql: String): Boolean = {
    val toks = tokenize(sql)
    val first = nextCode(toks, 0)
    if (first >= toks.length) return false
    if (toks(first).isWord("update")) { runUpdate(spark, toks, first); true }
    else if (toks(first).isWord("delete")) { runDelete(spark, toks, first); true }
    else false
  }

  /** DELETE removes rows where the predicate is TRUE; NULL-predicate rows
    * survive (SQL semantics), hence the coalesce. */
  private def runDelete(spark: SparkSession, toks: Vector[Tok], at: Int): Unit = {
    val from = nextCode(toks, at + 1)
    require(from < toks.length && toks(from).isWord("from"), "DELETE must be DELETE FROM <table>")
    val (table, rest) = tableName(toks, from + 1)
    val pred = whereClause(toks, rest)
    val keep = pred.fold("false")(p => s"NOT coalesce(($p), false)")
    swap(spark, table, s"SELECT * FROM $table WHERE $keep")
  }

  private def runUpdate(spark: SparkSession, toks: Vector[Tok], at: Int): Unit = {
    val (table, afterTable) = tableName(toks, at + 1)
    val set = nextCode(toks, afterTable)
    require(set < toks.length && toks(set).isWord("set"), "UPDATE must have a SET clause")
    // assignments run up to a depth-0 WHERE (or end of statement)
    var i = set + 1
    var depth = 0
    var whereAt = -1
    val commas = Vector.newBuilder[Int]
    while (i < toks.length && whereAt < 0) {
      val t = toks(i)
      if (t.kind == Sym && t.text == "(") depth += 1
      else if (t.kind == Sym && t.text == ")") depth -= 1
      else if (t.kind == Sym && t.text == "," && depth == 0) commas += i
      else if (t.isWord("where") && depth == 0) whereAt = i
      i += 1
    }
    val end = if (whereAt >= 0) whereAt else toks.length
    val bounds = (set +: commas.result() :+ end).sliding(2).toSeq
    val assignments = bounds.map { case Seq(a, b) =>
      val frag = toks.slice(a + 1, b)
      val eq = frag.indexWhere(t => t.kind == Sym && t.text == "=")
      require(eq > 0, s"malformed assignment: ${render(frag)}")
      val col = render(frag.slice(0, eq)).trim.stripPrefix("`").stripSuffix("`")
      col.toLowerCase -> render(frag.slice(eq + 1, frag.length)).trim
    }.toMap
    val pred = if (whereAt >= 0) Some(render(toks.slice(whereAt + 1, toks.length)).trim) else None
    val fields = spark.table(table).schema.fieldNames
    val unknown = assignments.keySet -- fields.map(_.toLowerCase)
    require(unknown.isEmpty, s"unknown column(s) in SET: ${unknown.mkString(", ")}")
    val select = fields.map { f =>
      assignments.get(f.toLowerCase) match {
        case Some(e) => pred match {
          case Some(p) => s"CASE WHEN coalesce(($p), false) THEN ($e) ELSE `$f` END AS `$f`"
          case None => s"($e) AS `$f`"
        }
        case None => s"`$f`"
      }
    }
    swap(spark, table, s"SELECT ${select.mkString(", ")} FROM $table")
  }

  /** Copy-on-write: CTAS fully materializes the new contents (the SELECT
    * executes before any catalog change), then drop + rename swaps it in. */
  private def swap(spark: SparkSession, table: String, select: String): Unit = {
    val tmp = s"${table}__graft_cow"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.sql(s"CREATE TABLE $tmp AS $select")
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
  }

  /** Consume a (possibly schema-qualified, possibly quoted) table name. */
  private def tableName(toks: Vector[Tok], from: Int): (String, Int) = {
    var i = nextCode(toks, from)
    val sb = new StringBuilder
    var done = false
    while (i < toks.length && !done) {
      toks(i).kind match {
        case Word | QIdent | Num =>
          sb.append(toks(i).text); i += 1
          if (i < toks.length && toks(i).kind == Sym && toks(i).text == ".") {
            sb.append('.'); i += 1
          } else done = true
        case _ => done = true
      }
    }
    require(sb.nonEmpty, "expected a table name")
    (sb.toString, i)
  }

  private def whereClause(toks: Vector[Tok], from: Int): Option[String] = {
    val w = nextCode(toks, from)
    if (w < toks.length && toks(w).isWord("where"))
      Some(render(toks.slice(w + 1, toks.length)).trim)
    else None
  }
}
