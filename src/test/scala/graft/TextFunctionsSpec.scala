package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens splits on any whitespace and drops empties") {
    val got = Seq("  a  b\tc\nd  ", "", "   ")
      .toDF("t").select(tokens($"t")).as[Seq[String]].collect()
    assert(got(0) === Seq("a", "b", "c", "d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("tokensRegex splits sub-word at digit/punct boundaries (BPE-ish)") {
    val got = Seq("abc123def!ghi", "v2.0-beta", "plain words")
      .toDF("t").select(tokensRegex($"t")).as[Seq[String]].collect()
    assert(got(0) === Seq("abc", "123", "def", "!", "ghi"))
    assert(got(1) === Seq("v", "2", ".", "0", "-", "beta"))
    assert(got(2) === Seq("plain", "words"))
  }

  test("fingerprint is whitespace/case insensitive but content sensitive") {
    val fps = Seq("Hello  World", "hello world", "hello\tworld", "hello worlds")
      .toDF("t").select(fingerprint($"t")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(1) === fps(2))
    assert(fps(2) !== fps(3))
  }

  test("langId classifies scripts (CJK fixtures per SURVEY hard-list e)") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "東方紅魔郷の曲をアレンジしました よろしくお願いします",  // kana+kanji → ja
      "东方红魔乡的曲子改编版本 希望大家喜欢 这是中文文本",      // han only → zh
      "한국어 텍스트입니다 안녕하세요 반갑습니다",               // hangul → ko
      "12345 67890 !!!")
      .toDF("t").select(langId($"t")).as[String].collect()
    assert(rows.toSeq === Seq("en", "ja", "zh", "ko", "other"))
  }

  test("shingles produces k-word shingles, deduped; short doc degenerates") {
    val got = Seq("a b c d", "a b", "x")
      .toDF("t").select(shingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0).toSet === Set("a b c", "b c d"))
    assert(got(1) === Seq("a b"))
    assert(got(2) === Seq("x"))
  }

  test("tokenChunks partitions the token stream; last chunk short; empty text empty") {
    val got = Seq("a b c d e f g", "a b c", "", "   ")
      .toDF("t").select(tokenChunks($"t", 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "d e f", "g"))
    assert(got(1) === Seq("a b c"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
  }

  test("pii counts and redaction: emails, ipv4s, phone-shaped spans") {
    val t = "mail a.user+tag@sub-domain.org or bob@x.io, host 10.0.255.7, " +
      "call 555-0100 or 555-01000 tail"
    val got = Seq(t).toDF("t")
      .select(emailCount($"t"), ipv4Count($"t"), phoneCount($"t"),
        piiRedact($"t"))
      .as[(Int, Int, Int, String)].collect()(0)
    assert(got._1 === 2)
    assert(got._2 === 1)
    // 555-01000: trailing digit breaks the \b — not a phone span
    assert(got._3 === 1)
    assert(got._4 === "mail <EMAIL> or <EMAIL>, host <IP>, " +
      "call <PHONE> or 555-01000 tail")
  }

  test("pii redaction is a no-op on clean text") {
    val clean = "the quick brown fox jumps over the lazy dog"
    val got = Seq(clean).toDF("t").select(piiRedact($"t")).as[String].collect()(0)
    assert(got === clean)
  }

  test("qualityScore rewards diverse prose, penalizes digit soup") {
    val q = Seq(
      "A reasonably long sentence with many distinct interesting words here.",
      "1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4")
      .toDF("t").select(qualityScore($"t")).as[Double].collect()
    assert(q(0) > 0.9)
    assert(q(1) < 0.8)
  }
}
