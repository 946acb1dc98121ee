package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Extraction planning over archive indexes (SURVEY F2/F3, J11/J12,
  * A5, §2.7 audits) — the extract_plan stage as pure DataFrames.
  *
  * Input shape (FIXTURES.md B3): one row per archive with `files`
  * and `dirs` array columns from a `7z l` index (S4 — produced by
  * ExternalProcess in production).
  *
  * Reference: Preprocessor/Extract/extract_plan.py:84-649.
  */
object ArchivePlan {

  private val AudioRe = "(?i)\\.(flac|mp3|wav|wv|m4a)$"
  private val AlbumDirRe =
    "(?i)^(?:\\d{4}[.\\- ]|\\[[^\\]]+\\]|\\()" // date-led, bracket-led, paren-led

  /** F2/F3: archive layout classifier → flat | nested | bundle (+
    * review reasons). Derived per-archive quantities mirror
    * extract_plan.py:156-217:
    *  - flat:   audio files at the root (the archive IS one album)
    *  - nested: no root audio, one level of album-like dirs
    *  - bundle: multiple top dirs that are not album-like (a circle's
    *    whole discography in one archive)
    */
  def classifyLayout(archives: DataFrame): DataFrame = {
    val rootFiles = filter(col("files"), f => !f.contains("/"))
    val rootAudio = filter(rootFiles, f => f.rlike(AudioRe))
    val topDirs = array_distinct(transform(
      filter(col("files"), f => f.contains("/")),
      f => split(f, "/").getItem(0)))
    val albumLikeTop = filter(topDirs, d => d.rlike(AlbumDirRe))
    archives
      .withColumn("n_root_audio", size(rootAudio))
      .withColumn("n_top_dirs", size(topDirs))
      .withColumn("n_album_dirs", size(albumLikeTop))
      .withColumn("layout",
        when(col("n_root_audio") > 0, "flat")
          .when(col("n_top_dirs") === 0, "flat")
          .when(col("n_album_dirs") >= 1 &&
            col("n_album_dirs") === col("n_top_dirs"), "nested")
          .otherwise("bundle"))
      .withColumn("needs_manual_review",
        col("layout") === "bundle" && col("n_album_dirs") > 0)
  }

  /** J11: >1 archive claiming one (circle, album) — grouped HAVING
    * count>1 with deterministic member list
    * (extract_plan.py:634-649). `claims` rows: (circle, album,
    * archivePath). */
  def collisions(claims: DataFrame): DataFrame =
    claims.groupBy(col("circle"), col("album"))
      .agg(count(lit(1)).as("n_claims"),
        array_join(array_sort(collect_list(col("archivePath"))), ";")
          .as("claimants"))
      .filter(col("n_claims") > 1)

  /** W4: collision-resolution suggestion — prefer non-"!MP3"-style
    * archives, then lower root priority, then path
    * (extract_plan.py:348-372). */
  def suggestResolutions(claims: DataFrame): DataFrame = {
    val isMp3ish = lower(col("archivePath")).rlike("mp3|tta|ogg")
    val w = Window.partitionBy(col("circle"), col("album"))
      .orderBy(isMp3ish.cast("int").asc, col("rootPriority").asc,
        col("archivePath").asc)
    claims.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumnRenamed("archivePath", "suggested_keep")
  }

  /** J12: apply a resolutions table (circle, album, keepArchive):
    * drop losing claims; audit that every Keep was honoured —
    * returns (planned, orphanedKeeps); the caller refuses the build
    * unless orphanedKeeps is empty (extract_plan.py:283-345). */
  def applyResolutions(claims: DataFrame,
      resolutions: DataFrame): (DataFrame, DataFrame) = {
    val res = resolutions.select(col("circle"), col("album"),
      col("keepArchive"))
    val joined = claims.join(broadcast(res), Seq("circle", "album"), "left")
    val planned = joined.filter(col("keepArchive").isNull ||
      col("archivePath") === col("keepArchive")).drop("keepArchive")
    val honoured = planned.select(col("circle"), col("album"),
      col("archivePath").as("keepArchive"))
    val orphaned = res.join(honoured,
      Seq("circle", "album", "keepArchive"), "left_anti")
    (planned, orphaned)
  }

  /** A5: circle alias canonicalization — group directory spellings by
    * bracket key; canonical = lowest root priority, then longest
    * name, then lexicographic (extract_plan.py:375-416). */
  def canonicalCircleNames(circleDirs: DataFrame): DataFrame = {
    val key = lower(regexp_extract(col("dirName"), "^\\[(.+?)\\]", 1))
    val w = Window.partitionBy(col("circle_key"))
      .orderBy(col("rootPriority").asc, length(col("dirName")).desc,
        col("dirName").asc)
    circleDirs.withColumn("circle_key", key)
      .withColumn("canonical", first(col("dirName"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
  }
}
