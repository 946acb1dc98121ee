package graft

import graft.sources.Corpus
import org.apache.spark.sql.functions._

/** S1/S2/F1/A13 on a real (temp) CJK fixture tree — both listing
  * constructions agree, derived columns follow the
  * circle/album/track grain, and thumbnail election prefers
  * folder > cover. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpus")
    def touch(rel: String, bytes: Int): Unit = {
      val p = dir.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, Array.fill[Byte](bytes)(7))
    }
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] アルバム/(01) 曲.flac", 10)
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] アルバム/(02) 歌.MP3", 20)
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] アルバム/cover.jpg", 5)
    touch("[IOSYS] イオシス/2011.05.08 [例大祭8] アルバム/folder.png", 5)
    touch("[Alice] サークル/2013.01.01 別のアルバム/track.wav", 30)
    touch("[Alice] サークル/2013.01.01 別のアルバム/scans/cover.jpg", 5)
    touch("[Alice] サークル/readme.txt", 3)
    dir.toString
  }

  test("S1/S2: distributed and driver-walk listings agree on the tree") {
    val dist = Corpus.listing(spark, root)
      .select("relPath", "sizeBytes", "depth", "circle", "album", "ext")
    val walk = Corpus.listingDriverWalk(spark, root)
      .select("relPath", "sizeBytes", "depth", "circle", "album", "ext")
    assert(dist.exceptAll(walk).count() === 0)
    assert(walk.exceptAll(dist).count() === 0)
    assert(dist.count() === 7)
    val row = dist.filter(col("relPath").endsWith("(01) 曲.flac")).collect()(0)
    assert(row.getAs[String]("circle") === "[IOSYS] イオシス")
    assert(row.getAs[String]("album") === "2011.05.08 [例大祭8] アルバム")
    assert(row.getAs[Int]("depth") === 3)
    assert(row.getAs[Long]("sizeBytes") === 10L)
  }

  test("F1: audio whitelist is case-insensitive on extension") {
    val audio = Corpus.audioFiles(Corpus.listingDriverWalk(spark, root))
      .select("fileName").as[String].collect().sorted
    assert(audio.toSeq === Seq("(01) 曲.flac", "(02) 歌.MP3", "track.wav"))
  }

  test("A13: thumbnail election prefers folder over cover, one per album") {
    val thumbs = Corpus.electThumbnails(Corpus.listingDriverWalk(spark, root))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(thumbs("2011.05.08 [例大祭8] アルバム").endsWith("folder.png"))
    assert(thumbs("2013.01.01 別のアルバム").endsWith("cover.jpg"))
  }
}
