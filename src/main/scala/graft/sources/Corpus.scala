package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The filesystem-corpus source (SURVEY S1/S2/S3): one shared
  * file-listing DataFrame replacing the root re-walk every reference
  * stage performs.
  *
  * Two constructions:
  *  - `listing(root)` — Spark's binaryFile source in metadata-only
  *    projection (content column pruned ⇒ no file reads), which
  *    distributes listing across executors; the 100 TB shape.
  *  - `listingDriverWalk(root)` — driver-side NIO walk for small
  *    fixture trees in tests (captures the `readable` flag the
  *    reference records for lost+found dirs — artist_scanner_ph2.py:22-27).
  *
  * Derived columns follow the `<circle>/<album>/[<disc>/]<track>`
  * grain (Docs/STEPS.md:163).
  */
object Corpus {

  /** Distributed listing via the binaryFile source; selecting only
    * metadata keeps the parquet-like pruned scan (no content I/O). */
  def listing(spark: SparkSession, root: String): DataFrame =
    decorate(
      spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(col("path"), col("length").as("sizeBytes")),
      root)

  /** Driver-side recursive walk (small trees / tests); unreadable
    * directories are recorded, not fatal. */
  def listingDriverWalk(spark: SparkSession, root: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rootPath = java.nio.file.Paths.get(root)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    def walk(dir: java.nio.file.Path): Unit = {
      // Files.list opens a DirectoryStream whose fd is freed only on
      // close — relying on GC leaks one fd per directory until EMFILE
      // on a large tree; close eagerly once the entries are drained
      val entries =
        try {
          val s = java.nio.file.Files.list(dir)
          try s.iterator.asScala.toSeq finally s.close()
        } catch { case _: Exception =>
          rows += ((dir.toString, 0L, false)); return
        }
      entries.sortBy(_.toString).foreach { p =>
        if (java.nio.file.Files.isDirectory(p)) walk(p)
        else rows += ((p.toString,
          try java.nio.file.Files.size(p) catch { case _: Exception => 0L },
          true))
      }
    }
    walk(rootPath)
    val df = spark.createDataFrame(rows.toSeq)
      .toDF("path", "sizeBytes", "readable")
    decorate(df, root)
  }

  /** Shared derived columns: relPath, depth, circle (depth-1 dir),
    * album (depth-2 dir), fileName, ext (lowercased — F1's
    * case-insensitivity is load-bearing, info_scanner_ph1.py:316-324). */
  private def decorate(df: DataFrame, root: String): DataFrame = {
    val rootNorm = root.stripSuffix("/")
    val rel = regexp_replace(col("path"),
      "^(?:file:)?" + java.util.regex.Pattern.quote(rootNorm) + "/?", "")
    df.withColumn("relPath", rel)
      .withColumn("segments", split(col("relPath"), "/"))
      .withColumn("depth", size(col("segments")))
      .withColumn("circle", col("segments").getItem(0))
      .withColumn("album", when(size(col("segments")) >= 2,
        col("segments").getItem(1)))
      .withColumn("fileName", element_at(col("segments"), -1))
      .withColumn("ext",
        lower(regexp_extract(col("fileName"), "\\.([^.]+)$", 1)))
      .drop("segments")
  }

  val AudioExts = Seq("flac", "mp3", "wav", "wv", "m4a")
  val ArchiveExts = Seq("7z", "zip", "rar")
  val ImageExts = Seq("jpg", "jpeg", "png", "webp", "bmp", "gif")

  /** F1: extension whitelists (case handled at decorate time). */
  def audioFiles(listing: DataFrame): DataFrame =
    listing.filter(col("ext").isin(AudioExts: _*))

  /** A13: thumbnail election — first asset named folder/cover with an
    * image extension, preferring exact "folder" then "cover"
    * (info_scanner_ph1.py:185-224 shape). */
  def electThumbnails(listing: DataFrame): DataFrame = {
    val stem = lower(regexp_replace(col("fileName"), "\\.[^.]+$", ""))
    val pri = when(stem === "folder", 0).when(stem === "cover", 1)
      .when(stem.startsWith("folder"), 2).when(stem.startsWith("cover"), 3)
      .otherwise(99)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("circle"), col("album"))
      .orderBy(col("pri"), col("relPath"))
    listing.filter(col("ext").isin(ImageExts: _*))
      .withColumn("pri", pri)
      .filter(col("pri") < 99)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("circle"), col("album"), col("relPath").as("thumbnail"))
  }
}
