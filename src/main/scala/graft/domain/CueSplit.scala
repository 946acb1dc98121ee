package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cue-sheet split planning (SURVEY X12-X14, A7, E3).
  *
  * The split itself is an effectful ffmpeg stage; everything here is
  * the pure plan: per-track begin/duration from cue INDEX 01 frames
  * via a lead window, output filename synthesis, and the cue-vs-album
  * classification confidence.
  *
  * Reference: Preprocessor/CueSplitter/CueSplitInfoProvider/CueSplit.cs:37-197,
  * cue_scanner.py:26-65.
  */
object CueSplit {

  /** X12: sanitize a filename — the 9 reserved characters map to
    * their fullwidth forms (CueSplit.cs:37-48). */
  def sanitizeFilename(name: Column): Column =
    translate(name, "\\/:*?\"<>|", "＼／：＊？＂＜＞｜")

  /** X13: split-track filename `(NN) [performer] title.flac`
    * (CueSplit.cs:50-76). */
  def splitFilename(trackNo: Column, performer: Column, title: Column): Column =
    sanitizeFilename(format_string("(%02d) [%s] %s.flac",
      trackNo, coalesce(performer, lit("Unknown")), title))

  /** X14: cue INDEX 01 frames (75 fps) → begin seconds and duration;
    * the next track's INDEX 01 in the same FILE bounds this track,
    * the last track runs to EOF (null duration ⇒ omit -t)
    * (CueSplit.cs:179-197, MPV strategy). */
  def trackTimes(cueTracks: DataFrame, cueCol: String, fileCol: String,
      trackNoCol: String, framesCol: String): DataFrame = {
    val w = Window.partitionBy(col(cueCol), col(fileCol))
      .orderBy(col(trackNoCol))
    cueTracks
      .withColumn("begin_sec", col(framesCol).cast("double") / 75.0)
      .withColumn("next_begin_sec",
        lead(col(framesCol), 1).over(w).cast("double") / 75.0)
      .withColumn("duration_sec", col("next_begin_sec") - col("begin_sec"))
      .drop("next_begin_sec")
  }

  /** A7: cue-split confidence from per-album counts — the decisive
    * predicate is "exactly one FILE, more than one AUDIO TRACK, FILE
    * resolves" (run-record §5); degraded signals lower confidence
    * (cue_scanner.py:26-65). */
  def splitConfidence(nCueFiles: Column, nAudioTracks: Column,
      fileResolves: Column, nAudioFiles: Column): Column =
    when(nCueFiles === 1 && nAudioTracks > 1 && fileResolves &&
      nAudioFiles === 1, lit(1.0))
      .when(nCueFiles === 1 && nAudioTracks > 1 && fileResolves, lit(0.8))
      .when(nCueFiles === 1 && nAudioTracks > 1, lit(0.5))
      .when(nCueFiles > 1 && nAudioTracks > 1, lit(0.3))
      .otherwise(lit(0.0))
}
