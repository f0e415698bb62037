package graft.io

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Local-filesystem plumbing for the blueprint CLIs (SURVEY.md §2.1
  * A2/A3/A9/A11): recursive discovery, regex filtering, path composition,
  * destination-folder creation.
  *
  * Discovery and filtering run on the driver — the file LIST is tiny even
  * when the files are not; the matched paths are then handed to
  * `spark.read.csv(paths: _*)` as ONE DataFrame so executors parallelize
  * the actual reads (and one SaveMode governs the whole load, fixing the
  * reference's replace-per-file bug, `upload_file.py:193-200`).
  */
object LocalFiles {

  /** Recursive file listing under `folder` (A2; `upload_file.py:85-93`
    * globs the folder recursively). Returns regular files only, sorted
    * for determinism. */
  def findAllFileNames(folder: String): Seq[String] = {
    val root = Paths.get(folder)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val stream = Files.walk(root)
      try stream.iterator.asScala
        .filter(Files.isRegularFile(_))
        .map(_.toString)
        .toSeq
        .sorted
      finally stream.close()
    }
  }

  /** Regex filter with the reference's `re.search` substring semantics
    * against the FULL path (A3; `upload_file.py:96-105`): the pattern
    * matches anywhere in the path unless anchored. */
  def findFileMatches(fileNames: Seq[String], pattern: String): Seq[String] = {
    val re = new Regex(pattern)
    fileNames.filter(p => re.findFirstIn(p).isDefined)
  }

  /** Folder + file composition with normalization (A11;
    * `upload_file.py:108-115`). An empty folder yields the bare file name. */
  def combine(folder: String, fileName: String): String =
    if (folder == null || folder.isEmpty) Paths.get(fileName).normalize().toString
    else Paths.get(folder, fileName).normalize().toString

  /** Create the destination folder if absent (A9;
    * `store_query_results.py:147-149`). */
  def ensureFolder(folder: String): Unit =
    if (folder != null && folder.nonEmpty) Files.createDirectories(Paths.get(folder))

  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator.asScala.foreach(deleteRecursively)
      finally stream.close()
    }
    Files.deleteIfExists(p)
  }
}
