package graft.examples

import graft.domain._
import graft.operators._
import graft.sources.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end library usage sample: builds a miniature music-catalog
  * from a real on-disk fixture tree through the public operator API —
  * the SURVEY §3.1 lifecycle in one main:
  * corpus listing → disc classification → metadata extraction →
  * majority vote → gap fill → resume anti-join → HLS planning.
  *
  * Run: sbt "runMain graft.examples.CatalogPipelineDemo [rootDir]"
  * (creates a fixture tree in a temp dir when no root is given).
  */
object CatalogPipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = if (args.nonEmpty) args(0) else makeFixtureTree()
    println(s"== corpus root: $root")

    // S1/S2: one shared file listing
    val listing = Corpus.listingDriverWalk(spark, root).cache()
    println(s"== listing: ${listing.count()} files")
    listing.show(5, truncate = false)

    // F1 + F4/F5: audio files, disc-dir classification
    val audio = Corpus.audioFiles(listing)
    val discDirs = audio.filter(col("depth") === 4)
      .select(col("circle"), col("album"),
        split(col("relPath"), "/").getItem(2).as("discDir")).distinct()
      .withColumn("looks_like_disc", DiscScanner.looksLikeDisc(col("discDir")))
      .withColumn("disc_index", DiscScanner.discIndexFromName(col("discDir")))
      .withColumn("veto", DiscScanner.neverADiscReason(col("discDir")))
    println("== disc classification")
    discDirs.show(truncate = false)

    // X1-X7: album + track metadata extraction
    val albums = listing.select(col("circle"), col("album")).distinct()
      .withColumn("br", CatalogExtract.bracketContents(col("album")))
      .withColumn("release_date",
        CatalogExtract.partialDate(col("album"), col("br")))
      .withColumn("catalog_no", CatalogExtract.catalogNumber(col("br")))
      .withColumn("convention", CatalogExtract.convention(col("br")))
      .withColumn("album_name",
        CatalogExtract.albumNameResidue(col("album"), col("br")))
    println("== album metadata")
    albums.drop("br").show(truncate = false)

    val tracks = audio
      .withColumn("p", CatalogExtract.parseTrackFilename(col("fileName")))
      .select(col("circle"), col("album"), col("fileName"),
        col("p.track").as("track"), col("p.artist").as("artist"),
        col("p.title").as("title"))
    println("== parsed tracks")
    tracks.show(truncate = false)

    // A3: fill missing track numbers
    val filled = Grouping.gapFillNumbers(
      tracks.withColumn("track", coalesce(col("track"), lit(-1))),
      Seq("circle", "album"), "track", "fileName")
    println("== after gap fill")
    filled.orderBy("album", "fileName").show(truncate = false)

    // §2.3: resume anti-join against a completed journal
    val completed = spark.createDataFrame(
      Seq(Tuple1(filled.select("fileName").orderBy("fileName").limit(1)
        .collect()(0).getString(0)))).toDF("fileName")
    val pending = Resume.pending(filled, completed, Seq("fileName"))
    println(s"== resume: ${filled.count()} total, ${pending.count()} pending")

    // Multimodal: artwork as binary media → decode → features → resize plan
    val art = Multimodal.asMediaTable(
      listing.filter(col("ext") === "jpg")
        .withColumn("content", lit("fakejpegbytes".getBytes)),
      "relPath", "content", "image/jpeg")
    val frames = Multimodal.decodeFrames(art, new Multimodal.FakeDecoder(2, 4))
    val feats = Multimodal.frameFeatures(frames)
    println(s"== multimodal: ${art.count()} media, ${feats.count()} frame features")
    feats.show(2, truncate = 40)
    println("== artwork dominant-color palettes (X24)")
    Multimodal.dominantColors(frames, k = 4).show(2, truncate = 60)

    // S6-style probe harness with a recorded runner (no ffprobe here)
    val runner = new ExternalProcess.RecordingRunner(argv =>
      ExternalProcess.Result(0, s"""{"format":{"duration":"123.4"}}""", ""))
    import spark.implicits._
    val probeCmds = pending.limit(3).select(col("fileName")).as[String]
      .map(f => (f, Seq("ffprobe", "-print_format", "json", f)))
    val probed = ExternalProcess.runPerRow(probeCmds, runner)
    println("== external-process probe results")
    probed.show(20, truncate = 60)

    // X18/X19: HLS plan for pending tracks
    val plan = MediaPlan.hlsBaseDirs(
      pending.withColumn("path", concat_ws("/", col("circle"), col("album"),
        col("fileName"))), "path",
      spark.emptyDataFrame.select(lit("").as("path")).limit(0))
      .withColumn("shard", MediaPlan.shardIndex(col("path"), 4))
    println("== hls plan")
    plan.select("path", "hls_base", "shard").show(truncate = false)

    spark.stop()
  }

  /** Fixture tree per FIXTURES.md B1 (CJK names, disc subdirs,
    * same-stem pair, unnumbered tracks). */
  private def makeFixtureTree(): String = {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-demo").toString
    def touch(rel: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, "x".getBytes)
    }
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] [ABCD-0123] 東方アレンジ/(01) [ZUN] Necrofantasia.flac")
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] [ABCD-0123] 東方アレンジ/(02) [ZUN] U.N. Owen.flac")
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] [ABCD-0123] 東方アレンジ/untagged bonus.flac")
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] [ABCD-0123] 東方アレンジ/folder.jpg")
    touch("[Alice's] 同人サークル/2013.xx.xx [C84] Compilation/Disc 1/(01) [A] Song.flac")
    touch("[Alice's] 同人サークル/2013.xx.xx [C84] Compilation/Disc 2 (FLAC)/(01) [B] Tune.flac")
    touch("[Alice's] 同人サークル/2013.xx.xx [C84] Compilation/Bonus Disc/(01) [C] Extra.flac")
    touch("[Alice's] 同人サークル/2013.xx.xx [C84] Compilation/track.flac")
    touch("[Alice's] 同人サークル/2013.xx.xx [C84] Compilation/track.mp3")
    root
  }
}
