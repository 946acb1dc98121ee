package graft

import graft.domain.ArchivePlan
import graft.operators.{ArchiveIndex, ExternalProcess}
import org.apache.spark.sql.functions._

/** S4 exercised against REAL archives: zips built by the system `zip`,
  * indexed by `unzip` through the production CommandRunner, classified
  * by ArchivePlan — no recorded transcripts anywhere in the chain.
  * The reference's own `7z l -slt` format is covered by a
  * format-accurate transcript parse test. */
class ArchiveIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val zipDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-archives")
    val r = new ExternalProcess.CommandRunner()
    def mk(tree: Map[String, String], zipName: String): Unit = {
      val src = java.nio.file.Files.createTempDirectory("graft-zip-src")
      tree.foreach { case (rel, content) =>
        val p = src.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, content)
      }
      val res = r.run(Seq("sh", "-c",
        s"cd '$src' && zip -q -r '$dir/$zipName' ."))
      assert(res.exitCode == 0, s"zip failed: ${res.stderr}")
    }
    mk(Map("track01.flac" -> "x", "track02.mp3" -> "y", "cover.jpg" -> "z"),
      "flat.zip")
    mk(Map(
      "2011.05.08 [例大祭8] アルバム/01 曲.flac" -> "a",
      "2011.05.08 [例大祭8] アルバム/02 歌.flac" -> "b",
      "2013.01.01 別のアルバム/01 track.flac" -> "c"), "nested.zip")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/corrupt.zip"), "this is not a zip")
    dir.toString
  }

  test("S4 end-to-end: real zips → unzip index → layout classification") {
    val archives = Seq(s"$zipDir/flat.zip", s"$zipDir/nested.zip",
      s"$zipDir/corrupt.zip").toDS()
    val entries = ArchiveIndex.indexArchives(archives,
      ArchiveIndex.UnzipLister, new ExternalProcess.CommandRunner())
    val files = ArchiveIndex.archiveFiles(entries)
    val classified = ArchivePlan.classifyLayout(files)
      .select("archive", "layout", "readable").collect()
      .map(r => r.getString(0).split("/").last ->
        (r.getString(1), r.getBoolean(2))).toMap
    assert(classified("flat.zip") === (("flat", true)))
    assert(classified("nested.zip") === (("nested", true)))
    assert(classified("corrupt.zip")._2 === false) // surfaced, not dropped
    // entry-level detail survived the real subprocess round trip
    val nestedFiles = entries.filter(col("archive").endsWith("nested.zip"))
      .filter(!col("is_dir")).select("path").as[String].collect().sorted
    assert(nestedFiles.length === 3)
    assert(nestedFiles(0) === "2011.05.08 [例大祭8] アルバム/01 曲.flac")
  }

  test("SevenZipLister parses the reference's 7z -slt transcript shape") {
    val transcript =
      """7-Zip 23.01 : Copyright (c) 1999-2023 Igor Pavlov
        |
        |Listing archive: album.7z
        |
        |--
        |Path = album.7z
        |Type = 7z
        |
        |----------
        |Path = 2011.05.08 [例大祭8] アルバム
        |Size = 0
        |Attributes = D_ drwxr-xr-x
        |
        |Path = 2011.05.08 [例大祭8] アルバム\01 曲.flac
        |Size = 1234
        |Attributes = A_ -rw-r--r--
        |
        |Path = readme.txt
        |Size = 10
        |Attributes = A_ -rw-r--r--
        |""".stripMargin
    val Some((files, dirs)) = ArchiveIndex.SevenZipLister.parse(transcript)
    assert(dirs === Seq("2011.05.08 [例大祭8] アルバム"))
    assert(files === Seq("2011.05.08 [例大祭8] アルバム/01 曲.flac",
      "readme.txt"))
    // unreadable: no separator
    assert(ArchiveIndex.SevenZipLister.parse("garbage").isEmpty)
  }
}
