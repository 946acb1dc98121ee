package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S4: archive indexing WITHOUT extraction — the reference reads
  * every archive's header via `7z l -slt` and derives its extraction
  * layout from the entry list (extract_plan.py:85-116). Distributed
  * shape: one subprocess per archive row through
  * [[ExternalProcess.runPerRow]], listing parse per row, one output
  * row per entry; unreadable archives keep a row (readable=false) —
  * the F7 never-drop-rows review contract.
  *
  * The listing format is pluggable: [[SevenZipLister]] parses the
  * reference's exact `7z l -slt` transcript shape; [[UnzipLister]]
  * drives Info-ZIP (`unzip -Z1`), which this container has — so the
  * real-subprocess path is exercised end-to-end against real
  * archives in ArchiveIndexSpec.
  */
object ArchiveIndex {

  /** One archive entry; unreadable archives emit a single row with
    * null path and readable=false. */
  case class Entry(archive: String, path: String, is_dir: Boolean,
      readable: Boolean)

  trait Lister extends Serializable {
    def argv(archivePath: String): Seq[String]
    /** (files, dirs) as archive-relative forward-slash paths, or None
      * if the listing is unreadable. */
    def parse(stdout: String): Option[(Seq[String], Seq[String])]
  }

  /** The reference's `7z l -slt` contract, ported verbatim
    * (extract_plan.py:91-116): body after the first `----------`
    * separator line, `Path = ` / `Attributes = ` pairs, `D` attribute
    * marks directories, backslashes normalized. */
  object SevenZipLister extends Lister {
    def argv(archivePath: String): Seq[String] =
      Seq("7z", "l", "-slt", archivePath)
    def parse(stdout: String): Option[(Seq[String], Seq[String])] = {
      val body = stdout.split("\n----------\n", 2)
      if (body.length != 2) return None
      val files = scala.collection.mutable.ArrayBuffer.empty[String]
      val dirs = scala.collection.mutable.ArrayBuffer.empty[String]
      var path: Option[String] = None
      body(1).linesIterator.foreach { line =>
        if (line.startsWith("Path = "))
          path = Some(line.stripPrefix("Path = ")
            .replace("\\", "/").stripSuffix("/"))
        else if (line.startsWith("Attributes = ") && path.isDefined) {
          if (line.stripPrefix("Attributes = ").contains("D")) dirs += path.get
          else files += path.get
          path = None
        }
      }
      Some((files.toSeq, dirs.toSeq))
    }
  }

  /** Info-ZIP `unzip -Z1` (zipinfo terse mode): one entry per line,
    * directories end with '/'. */
  object UnzipLister extends Lister {
    def argv(archivePath: String): Seq[String] =
      Seq("unzip", "-Z1", archivePath)
    def parse(stdout: String): Option[(Seq[String], Seq[String])] = {
      val lines = stdout.linesIterator.filter(_.nonEmpty).toSeq
      if (lines.isEmpty) None
      else Some((lines.filterNot(_.endsWith("/")),
        lines.filter(_.endsWith("/")).map(_.stripSuffix("/"))))
    }
  }

  /** Index every archive: one entry row per contained file/dir. */
  def indexArchives(archives: Dataset[String], lister: Lister,
      runner: ExternalProcess.Runner): Dataset[Entry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    val outputs = ExternalProcess.runPerRow(
      archives.map(p => (p, lister.argv(p))), runner)
    outputs.flatMap { o =>
      val parsed = if (o.exitCode == 0) lister.parse(o.stdout) else None
      parsed match {
        case Some((files, dirs)) =>
          files.iterator.map(Entry(o.key, _, is_dir = false, readable = true)) ++
            dirs.iterator.map(Entry(o.key, _, is_dir = true, readable = true))
        case None =>
          Iterator.single(Entry(o.key, null, is_dir = false, readable = false))
      }
    }
  }

  /** Per-archive `files` array relation — the input shape
    * [[graft.domain.ArchivePlan.classifyLayout]] consumes. Unreadable
    * archives surface with empty files and readable=false. */
  def archiveFiles(entries: Dataset[Entry]): DataFrame =
    entries.toDF()
      .groupBy(col("archive"))
      .agg(array_sort(collect_list(when(!col("is_dir") && col("readable"),
          col("path")))).as("files"),
        min(col("readable")).as("readable"))
}
