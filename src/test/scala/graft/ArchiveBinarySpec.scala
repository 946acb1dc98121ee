package graft

import graft.domain.{ArchivePlan, BinaryMeta}
import org.apache.spark.sql.functions._

class ArchivePlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val archives = Seq(
    ("flat.7z", Seq("01 a.flac", "02 b.flac", "cover.jpg"), Seq.empty[String]),
    ("nested.7z", Seq("2011.05 [C80] Album/01.flac",
      "[ABCD-01] Other/01.flac"), Seq.empty[String]),
    ("bundle.7z", Seq("Disco/2009 stuff/x.flac", "Misc/y.flac"),
      Seq.empty[String]),
    ("empty.7z", Seq.empty[String], Seq.empty[String]))
    .toDF("archivePath", "files", "dirs")

  test("F3 layout classifier: flat / nested / bundle") {
    val got = ArchivePlan.classifyLayout(archives)
      .select("archivePath", "layout").as[(String, String)].collect().toMap
    assert(got("flat.7z") === "flat")
    assert(got("nested.7z") === "nested")
    assert(got("bundle.7z") === "bundle")
    assert(got("empty.7z") === "flat")
  }

  private lazy val claims = Seq(
    ("c1", "albumA", "r1/a.7z", 0),
    ("c1", "albumA", "r2/a [MP3].7z", 1),
    ("c1", "albumB", "r1/b.7z", 0))
    .toDF("circle", "album", "archivePath", "rootPriority")

  test("J11 collisions + W4 suggestion prefers non-mp3 lower priority") {
    val coll = ArchivePlan.collisions(claims.drop("rootPriority")).collect()
    assert(coll.length === 1)
    assert(coll(0).getAs[Long]("n_claims") === 2)
    val sugg = ArchivePlan.suggestResolutions(claims)
      .filter($"album" === "albumA").collect()(0)
    assert(sugg.getAs[String]("suggested_keep") === "r1/a.7z")
  }

  test("J12 applyResolutions drops losers and audits orphaned keeps") {
    val res = Seq(("c1", "albumA", "r2/a [MP3].7z"),
      ("c1", "albumZ", "ghost.7z"))  // orphaned: no such claim
      .toDF("circle", "album", "keepArchive")
    val (planned, orphans) = ArchivePlan.applyResolutions(
      claims.drop("rootPriority"), res)
    val keptA = planned.filter($"album" === "albumA")
      .select("archivePath").as[String].collect()
    assert(keptA.toSeq === Seq("r2/a [MP3].7z"))
    assert(planned.filter($"album" === "albumB").count() === 1)
    val orph = orphans.collect()
    assert(orph.length === 1 && orph(0).getAs[String]("album") === "albumZ")
    intercept[IllegalArgumentException] {
      graft.operators.Resume.assertEmpty(orphans, "orphaned keeps")
    }
  }

  test("A5 canonical circle names: priority then longest") {
    val dirs = Seq(("[IOSYS]", 1), ("[IOSYS] イオシス", 1), ("[iosys] alt", 0))
      .toDF("dirName", "rootPriority")
    val got = ArchivePlan.canonicalCircleNames(dirs)
      .select("dirName", "canonical").as[(String, String)].collect().toMap
    assert(got.values.toSet === Set("[iosys] alt"))
  }
}

class BinaryMetaSpec extends SparkSpec {
  import spark.implicits._

  test("S18 FLAC STREAMINFO decode: 44.1k stereo 16-bit") {
    // craft a minimal header: fLaC + STREAMINFO block (34 bytes)
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x00; b(7) = 34 // block header: type 0, length 34
    val si = 8
    // sampleRate=44100 (0b1010_1100_0100_0100 ...): 20 bits at si+10
    b(si + 10) = 0x0A; b(si + 11) = 0xC4.toByte
    // si+12: top 4 bits of rate (0x4), channels-1 (1 → stereo) <<1, bps-1 top bit
    b(si + 12) = (0x40 | (1 << 1) | 0).toByte
    // si+13: bps-1 low 4 bits (15 → 16bit) <<4 | total samples top 4 bits
    b(si + 13) = (15 << 4).toByte
    // total samples = 441000 (10 s)
    b(si + 14) = ((441000 >> 24) & 0xFF).toByte
    b(si + 15) = ((441000 >> 16) & 0xFF).toByte
    b(si + 16) = ((441000 >> 8) & 0xFF).toByte
    b(si + 17) = (441000 & 0xFF).toByte
    val df = Seq(("t.flac", b), ("bad.bin", Array[Byte](1, 2, 3)))
      .toDF("path", "prefix")
    val got = BinaryMeta.withFlacInfo(df, "prefix")
      .select("path", "sampleRate", "channels", "bitsPerSample",
        "totalSamples", "durationSec").collect()
      .map(r => r.getString(0) -> r).toMap
    val t = got("t.flac")
    assert(t.getLong(1) === 44100L)
    assert(t.getInt(2) === 2)
    assert(t.getInt(3) === 16)
    assert(t.getLong(4) === 441000L)
    assert(math.abs(t.getDouble(5) - 10.0) < 1e-9)
    assert(got("bad.bin").isNullAt(1))
  }

  test("S5 snapshot delta: added/removed/moved/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("contentHash", "path")
    val nu = Seq((1L, "a"), (3L, "c2"), (4L, "d"))
      .toDF("contentHash", "path")
    val got = BinaryMeta.snapshotDelta(old, nu)
      .select("contentHash", "change").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "removed",
      3L -> "moved", 4L -> "added"))
  }

  test("X25 mintId: deterministic, uuid-shaped, collision-free on keys") {
    val ids = Seq("a", "b", "a").toDF("k")
      .select(BinaryMeta.mintId($"k")).as[String].collect()
    assert(ids(0) === ids(2))
    assert(ids(0) !== ids(1))
    assert(ids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }
}
