package graft.cli

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.config.{ArgParser, ConnectionConfig, InsertMethod, MatchType}
import graft.io.{CsvIO, LocalFiles, TableIO}

/** Blueprint CLI #1: CSV upload → table (SURVEY.md §2.1 A1–A6; reference
  * `upload_file.py:158-211`).
  *
  * Regex mode resolves matching files on the driver and reads them as ONE
  * DataFrame with ONE atomic SaveMode — deliberately fixing the
  * reference's replace-per-file bug, where `insert_method='replace'`
  * re-drops the table before every file so only the last match survives
  * (`upload_file.py:193-200`, SURVEY §7.4.2). Schema inference is one
  * global sampling pass, not the reference's per-chunk inference
  * (`upload_file.py:126`, SURVEY §7.4.1).
  */
object UploadFile {
  val flags: Set[String] = Set(
    "source-file-name-match-type", "source-file-name", "source-folder-name",
    "table-name", "insert-method", "schema",
    "host", "port", "database", "username", "password",
    "db-connection-url", "url-parameters")

  def main(args: Array[String]): Unit = {
    val p = ArgParser.parse(args, flags).fold(e => sys.error(e), identity)
    val matchType = MatchType.parse(p.getOrElse("source-file-name-match-type", "exact_match"))
      .fold(e => sys.error(e), identity)
    val method = InsertMethod.parse(p.getOrElse("insert-method", "append"))
      .fold(e => sys.error(e), identity)
    val table = p.getOrElse("table-name", sys.error("--table-name is required"))
    val file = p.getOrElse("source-file-name", sys.error("--source-file-name is required"))
    val folder = p.getOrElse("source-folder-name", "")
    val n = run(GraftSession.get("graft-upload-file"),
      matchType, folder, file, table, method, p.get("schema"), ExecuteSql.connectionOf(p))
    println(s"Successfully loaded $n file(s) into $table.")
  }

  /** @return number of source files loaded */
  def run(spark: SparkSession, matchType: MatchType, folder: String,
          fileNameOrPattern: String, table: String, method: InsertMethod,
          schema: Option[String] = None,
          conn: Option[ConnectionConfig] = None): Int = {
    val paths = matchType match {
      case MatchType.Exact => Seq(LocalFiles.combine(folder, fileNameOrPattern))
      case MatchType.Regex =>
        val found = LocalFiles.findAllFileNames(if (folder.isEmpty) "." else folder)
        val matches = LocalFiles.findFileMatches(found, fileNameOrPattern)
        if (matches.isEmpty)
          sys.error(s"no files matching '$fileNameOrPattern' under '$folder'")
        matches
    }
    val df = CsvIO.read(spark, paths)
    TableIO.write(df, table, method, schema, conn)
    paths.length
  }
}
