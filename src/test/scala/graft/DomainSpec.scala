package graft

import graft.domain._
import org.apache.spark.sql.functions._

class DiscScannerSpec extends SparkSpec {
  import spark.implicits._

  test("F4 looksLikeDisc: ordered rules (survey fixture names)") {
    val cases = Seq(
      ("Disc 2 (FLAC)", true),   // DISC_INDEX beats FORMAT
      ("CD1", true),
      ("WAV DISC", false),       // FORMAT beats BARE_DISC
      ("Bonus Disc", false),     // BONUS beats BARE_DISC
      ("Present Disc", false),
      ("THVA2_ASide", true),     // glued letter side
      ("おまけ", false),
      ("web ver", false),
      ("ディスク2", true),
      ("random folder", false))
    val got = cases.map(_._1).toDF("n")
      .select(DiscScanner.looksLikeDisc($"n")).as[Boolean].collect()
    cases.zip(got).foreach { case ((name, want), g) =>
      assert(g === want, s"'$name'")
    }
  }

  test("F5 neverADisc veto: DAW bundles and stem exports") {
    val got = Seq("proj.logicx/audio", "Stems", "Disc 1", "mix/Multi-Track")
      .toDF("p").select(DiscScanner.neverADiscReason($"p")).as[String].collect()
    assert(got(0) === "inside a DAW project bundle")
    assert(got(1) === "stem export, not a programme")
    assert(got(2) === null)
    assert(got(3) === "stem export, not a programme")
  }

  test("F6 filenameDiscs: strict multi-disc convention detection") {
    // albumA: genuine 2-disc (1-01..1-02, 2-01..2-02)
    val a = Seq("1-01 t.flac", "1-02 t.flac", "2-01 t.flac", "2-02 t.flac")
      .map(("A", _))
    // albumB: constant leading 1 → single disc (the 98-album FP class)
    val b = Seq("1-01 x.flac", "1-02 x.flac", "1-03 x.flac", "1-04 x.flac")
      .map(("B", _))
    // albumC: only one file matching (the 27-album FP class)
    val c = Seq("07 5 2 9.flac", "01 a.flac", "02 b.flac", "03 c.flac")
      .map(("C", _))
    val df = (a ++ b ++ c).toDF("album", "name")
    val got = DiscScanner.filenameDiscs(df, "album", "name")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("A" -> true, "B" -> false, "C" -> false))
  }

  test("X10 discIndexFromName cascade") {
    val cases = Seq(
      ("Disc 3", 3), ("CD2", 2), ("THVA2_ASide", 1), ("Side B", 2),
      ("ディスク2", 2), ("三", 3), ("Vol 7", 7), ("Side Red", 1))
    val got = cases.map(_._1).toDF("n")
      .select(DiscScanner.discIndexFromName($"n")).as[java.lang.Integer].collect()
    cases.zip(got).foreach { case ((name, want), g) =>
      assert(g === want, s"'$name'")
    }
  }
}

class CatalogExtractSpec extends SparkSpec {
  import spark.implicits._

  test("X1 canonical track filename parse") {
    val got = Seq("(03) [ZUN] Necrofantasia.flac", "(3) bad.flac",
        "(12) [IOSYS] Song. With.Dots.MP3")
      .toDF("n").select(CatalogExtract.parseTrackFilename($"n").as("p"))
      .select("p.track", "p.artist", "p.title").collect()
    assert(got(0).getInt(0) === 3 && got(0).getString(1) === "ZUN" &&
      got(0).getString(2) === "Necrofantasia")
    assert(got(1).isNullAt(0))
    assert(got(2).getString(2) === "Song. With.Dots")
  }

  test("X2 TRCK parse") {
    val got = Seq("7/10", "3", "abc", null)
      .toDF("t").select(CatalogExtract.trckToInt($"t")).as[Int].collect()
    assert(got.toSeq === Seq(7, 3, -1, -1))
  }

  test("X3 bracket parser incl. unterminated-opener skip") {
    val got = Seq("[C97] {ABCD-01} title", "{5150-A003] [C80] x", "none")
      .toDF("s").select(CatalogExtract.bracketContents($"s")).as[Seq[String]]
      .collect()
    assert(got(0) === Seq("C97", "ABCD-01"))
    assert(got(1) === Seq("C80"))  // bad '{' skipped, parse continues
    assert(got(2) === Seq.empty)
  }

  test("X4/X5/X6 date, catalog number, convention from brackets") {
    val df = Seq("2011.05.08 [例大祭8] [ABCD-0123] AlbumName (FLAC)")
      .toDF("name")
      .withColumn("br", CatalogExtract.bracketContents($"name"))
    val row = df.select(
      CatalogExtract.partialDate($"name", $"br"),
      CatalogExtract.catalogNumber($"br"),
      CatalogExtract.convention($"br")).collect()(0)
    assert(row.getString(0) === "2011.05.08")
    assert(row.getString(1) === "ABCD-0123")
    assert(row.getString(2) === "例大祭8")
  }

  test("X4 partial dates with xx placeholders; NOT_A_CONVENTION blocklist") {
    val df = Seq(("2013.xx.xx [FLAC] album", Seq("FLAC")),
        ("somewhere [2013] [C84]", Seq("2013", "C84")))
      .toDF("name", "br")
    val rows = df.select(
      CatalogExtract.partialDate($"name", $"br"),
      CatalogExtract.convention($"br")).collect()
    assert(rows(0).getString(0) === "2013.xx.xx")
    assert(rows(0).getString(1) === "")    // FLAC is not a convention
    assert(rows(1).getString(0) === "2013")
    assert(rows(1).getString(1) === "C84") // bare year excluded
  }

  test("X7 album name residue strips brackets") {
    val df = Seq("2011.05.08 [例大祭8] [ABCD-0123] My Album")
      .toDF("name").withColumn("br", CatalogExtract.bracketContents($"name"))
    val got = df.select(CatalogExtract.albumNameResidue($"name", $"br"))
      .as[String].collect()(0)
    assert(got === "2011.05.08 My Album")
  }

  test("X9 circle dir parse + X21 index key") {
    val r = Seq("[IOSYS] イオシス").toDF("d")
      .select(CatalogExtract.parseCircleDir($"d").as("p"))
      .select("p.name", "p.alias").collect()(0)
    assert(r.getString(0) === "IOSYS" && r.getString(1) === "イオシス")
    val k = Seq("007", "0", "12").toDF("i")
      .select(CatalogExtract.trimIndexKey($"i")).as[String].collect()
    assert(k.toSeq === Seq("7", "0", "12"))
  }
}

class MediaPlanSpec extends SparkSpec {
  import spark.implicits._

  test("X11 static gain: clamp, silence, null propagation") {
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (-20.0, -8.0),   // ΔI=6, ΔTP=7 → 6
      (-10.0, -0.5),   // attenuation: ΔI=-4, ΔTP=-0.5 → -4
      (-40.0, -30.0),  // quiet: ΔI=26 capped at 12
      (-70.0, -60.0),  // silence floor → 0
      (null, -5.0))    // missing → 0
      .toDF("i", "tp")
      .select(MediaPlan.staticGainDb($"i", $"tp")).as[Double].collect()
    assert(rows.toSeq === Seq(6.0, -4.0, 12.0, 0.0, 0.0))
  }

  test("X18 stem collision renames only colliders") {
    val tracks = Seq("al/track.flac", "al/track.mp3", "al/other.flac")
      .toDF("path")
    val occupied = Seq("al/occupied").toDF("path")
    val got = MediaPlan.hlsBaseDirs(tracks, "path", occupied)
      .select("path", "hls_base").as[(String, String)].collect().toMap
    assert(got("al/track.flac") === "al/track [flac]")
    assert(got("al/track.mp3") === "al/track [mp3]")
    assert(got("al/other.flac") === "al/other")
  }

  test("X15 byterange resolution: explicit and prev_end chaining") {
    // seq 4 is the non-contiguous case: an implicit segment after an
    // explicit jump must chain from THAT offset (999+50=1049), not
    // from the global running length (dash-repackage.py prev_end+1).
    val segs = Seq(("t", 1, "100@0"), ("t", 2, "250"), ("t", 3, "50@999"),
      ("t", 4, "30"))
      .toDF("trk", "seq", "br")
    val got = MediaPlan.resolveByteranges(segs, "trk", "seq", "br")
      .orderBy("seq").select("resolved_off", "seg_len")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 100L), (100L, 250L), (999L, 50L),
      (1049L, 30L)))
  }

  test("X15 byterange: all-implicit playlist starts at 0 and chains") {
    val segs = Seq(("t", 1, "10"), ("t", 2, "20"), ("t", 3, "30"))
      .toDF("trk", "seq", "br")
    val got = MediaPlan.resolveByteranges(segs, "trk", "seq", "br")
      .orderBy("seq").select("resolved_off", "seg_len")
      .as[(Long, Long)].collect()
    assert(got.toSeq === Seq((0L, 10L), (10L, 20L), (30L, 30L)))
  }

  test("X16 ISO-8601 durations") {
    val got = Seq(30.0, 90.5, 3750.0).toDF("s")
      .select(MediaPlan.secondsToIso8601($"s")).as[String].collect()
    assert(got.toSeq === Seq("PT30S", "PT1M30.5S", "PT1H2M30S"))
  }

  test("E6 mpdDocument is byte-identical to the reference-generated fixture") {
    import MpdFixture._
    // the same three representations the Python fixture generator
    // (ElementTree + minidom, dash-repackage.py algorithm) was fed
    val reps = Seq(
      Rep(64000L, "64k/", "single_file", "media.m4s", 0L, 761L, null, null,
        Seq(4.0096, 4.0096, 1.984),
        Seq(Rng(762L, 403157L), Rng(403158L, 803999L), Rng(804000L, 1000000L))),
      Rep(128000L, "128k/", "single_file", "media.m4s", 0L, 899L, null, null,
        Seq(4.0096, 4.0096, 2.0),
        Seq(Rng(900L, 700000L), Rng(700001L, 1400000L), Rng(1400001L, 1700000L))),
      Rep(256000L, "256k/", "template", null, 0L, 0L, "init.mp4",
        "seg-$Number$.m4s", Seq(4.0096, 4.0096, 2.0), Seq.empty))
    val got = Seq(Tuple2("trk", reps)).toDF("track_id", "reps")
      .select(MediaPlan.mpdDocument($"reps")).as[String].collect()(0)
    val expected = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/graft/mpd_fixture.xml"), "UTF-8")
      try src.mkString finally src.close()
    }
    assert(got === expected)
  }

  test("X19 shard ownership is stable and partitions completely") {
    val ids = (1 to 100).map(i => s"track-$i").toDF("id")
    val got = ids.select(MediaPlan.shardIndex($"id", 4)).as[Int].collect()
    assert(got.forall(s => s >= 0 && s < 4))
    val again = ids.select(MediaPlan.shardIndex($"id", 4)).as[Int].collect()
    assert(got.toSeq === again.toSeq)
  }
}

class CueSplitSpec extends SparkSpec {
  import spark.implicits._

  test("X12/X13 sanitize + split filename") {
    val got = Seq((3, "P*", "A:B?"))
      .toDF("n", "p", "t")
      .select(CueSplit.splitFilename($"n", $"p", $"t")).as[String].collect()(0)
    assert(got === "(03) [P＊] A：B？.flac")
  }

  test("X14 cue timing: next INDEX bounds, last runs to EOF") {
    val tracks = Seq(("c", "f", 1, 0L), ("c", "f", 2, 75L * 90),
        ("c", "f", 3, 75L * 200)).toDF("cue", "file", "no", "frames")
    val got = CueSplit.trackTimes(tracks, "cue", "file", "no", "frames")
      .orderBy("no").select("begin_sec", "duration_sec")
      .as[(Double, Option[Double])].collect()
    assert(got(0) === ((0.0, Some(90.0))))
    assert(got(1) === ((90.0, Some(110.0))))
    assert(got(2)._2.isEmpty)
  }
}

/** Encoder-friendly rows for the MPD fixture test. */
object MpdFixture {
  case class Rng(s: Long, e: Long)
  case class Rep(bandwidth: Long, base_url: String, layout: String,
      media_file: String, init_start: Long, init_end: Long,
      init_file: String, segment_template: String,
      durations: Seq[Double], ranges: Seq[Rng])
}
