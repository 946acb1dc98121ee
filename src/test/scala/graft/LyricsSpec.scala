package graft

import graft.domain.Lyrics
import graft.domain.Lyrics._
import org.apache.spark.sql.functions._

class LyricsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val doc = LyricsDoc("trk-1", need_review = false, Seq(
    LyricsSection("Verse 1", Seq(
      LangBlock("ja", Seq(
        LyricsLine(Some("00:12.50"), "幻想の月",
          Seq(RubyAnnotation(0, 2, "げんそう"), RubyAnnotation(3, 1, "つき"))),
        LyricsLine(None, "夜空に舞う", Nil))),
      LangBlock("en", Seq(
        LyricsLine(Some("00:12.50"), "Moon of illusion", Nil),
        LyricsLine(None, "Dancing in the night sky", Nil))))),
    LyricsSection("Chorus", Seq(
      LangBlock("ja", Seq(
        LyricsLine(Some("00:45.00"), "さくら", Nil)))))))

  private lazy val doc2 = LyricsDoc("trk-2", need_review = true, Seq(
    LyricsSection("Intro", Seq(
      LangBlock("ja", Seq(LyricsLine(None, "インスト", Nil)))))))

  test("explode → re-nest round trip preserves the document exactly") {
    val ds = Seq(doc, doc2).toDS()
    val back = Lyrics.renest(Lyrics.explodeLines(ds))
      .collect().map(d => d.track_id -> d).toMap
    assert(back("trk-1") === doc)
    assert(back("trk-2") === doc2)
  }

  test("flat relation supports line-level transforms before re-nesting") {
    val flat = Lyrics.explodeLines(Seq(doc).toDS())
    // e.g. keep only timed ja lines — a typical LRC-export filter
    val timedJa = flat.filter(col("lang") === "ja" && col("time").isNotNull)
    val back = Lyrics.renest(timedJa).collect()(0)
    assert(back.sections.map(_.title) === Seq("Verse 1", "Chorus"))
    assert(back.sections.head.blocks.map(_.lang) === Seq("ja"))
    assert(back.sections.head.blocks.head.lines.map(_.text) === Seq("幻想の月"))
  }

  test("parseLyricsJson reads the formatter's serialized shape") {
    val json =
      """{"Verse 1": {"ja": [
        |  {"time": "00:12.50", "text": "幻想の月",
        |   "annotations": [{"index": 0, "length": 2, "text": "げんそう"}]},
        |  {"time": null, "text": "夜空に舞う", "annotations": []}]},
        | "need_review": false}""".stripMargin.replaceAll("\n", " ")
    val got = Lyrics.parseLyricsJson(
      Seq(("trk-9", json)).toDF("id", "lyrics"), "lyrics", "id").collect()
    assert(got.length === 1)
    val d = got(0)
    assert(d.track_id === "trk-9" && !d.need_review)
    assert(d.sections.map(_.title).contains("Verse 1"))
    val lines = d.sections.find(_.title == "Verse 1").get
      .blocks.find(_.lang == "ja").get.lines
    assert(lines.map(_.text) === Seq("幻想の月", "夜空に舞う"))
    assert(lines.head.annotations === Seq(RubyAnnotation(0, 2, "げんそう")))
    assert(lines.head.time === Some("00:12.50"))
  }

  test("renderRuby applies annotations right-to-left") {
    val line = LyricsLine(None, "幻想の月",
      Seq(RubyAnnotation(0, 2, "げんそう"), RubyAnnotation(3, 1, "つき")))
    assert(Lyrics.renderRuby(line) === "幻想(げんそう)の月(つき)")
  }
}
