package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Album/track metadata extraction heuristics (SURVEY X1-X9, X21) —
  * the ph2 string surface, ported from the reference's measured
  * regexes (Processor/InfoCollector/AlbumInfo/info_scanner_ph2.py).
  * Everything except the bracket parser and unicode normalizer is
  * pure codegen'd columns.
  */
object CatalogExtract {

  private val AudioExt = "(?:flac|mp3|wav|wv|m4a)"

  /** X1: canonical track filename `(NN) [artist] title.ext`
    * (info_scanner_ph2.py:26-32). Returns struct(track, artist,
    * title); nulls when invalid. */
  def parseTrackFilename(name: Column): Column = {
    val re = s"\\((\\d{2})\\) \\[([^\\]]+)\\] (.+)\\.(?i)$AudioExt$$"
    val valid = name.rlike(s"^\\(\\d{2}\\) \\[[^\\]]+\\] .+\\.(?i)$AudioExt$$")
    when(valid, struct(
      regexp_extract(name, re, 1).cast("int").as("track"),
      regexp_extract(name, re, 2).as("artist"),
      regexp_extract(name, re, 3).as("title")))
  }

  /** X2: ID3 TRCK "7/10" → 7; non-decimal → -1
    * (info_scanner_ph2.py:156-170). */
  def trckToInt(trck: Column): Column = {
    val head = split(trck, "/").getItem(0)
    when(trck.isNull, -1)
      .when(head.rlike("^\\d+$"), head.cast("int"))
      .otherwise(-1)
  }

  /** X3: balanced-bracket content extraction for `[...]` / `{...}`,
    * skipping unterminated openers (info_scanner_ph2.py:73-103 incl.
    * the "{5150-A003]" lesson). Stack parser as a UDF — inherently
    * sequential over one short string. */
  val bracketContents: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else {
        val pairs = Map('[' -> ']', '{' -> '}')
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (pairs.contains(c)) {
            val close = s.indexOf(pairs(c), i + 1)
            if (close == -1) i += 1 // unterminated: skip opener, keep parsing
            else { out += s.substring(i + 1, close); i = close + 1 }
          } else i += 1
        }
        out.toSeq
      }
    }

  private val DateRe = "(\\d{4}(?:\\.(?:\\d{2}|x{2}))?(?:\\.(?:\\d{2}|x{2}))?)"

  /** X4: partial release date `yyyy[.MM|xx[.dd|xx]]` from the name
    * head (first 10 chars) or else the first matching bracket
    * (info_scanner_ph2.py:219-230). `brackets` from
    * [[bracketContents]]. */
  def partialDate(albumName: Column, brackets: Column): Column = {
    val head = regexp_extract(substring(albumName, 1, 10), s"^$DateRe", 1)
    val fromBrackets =
      filter(transform(brackets, b => regexp_extract(b, s"^$DateRe", 1)),
        m => m =!= "")
    when(head =!= "", head)
      .otherwise(coalesce(get(fromBrackets, lit(0)), lit("")))
  }

  /** X5: catalog-number heuristic — a bracket with a dash, length
    * 5..15, ≥2 digits and ≥2 letters; first wins
    * (info_scanner_ph2.py:241-250). */
  def catalogNumber(brackets: Column): Column = {
    val isCat = (b: Column) =>
      b.contains("-") && length(b).between(5, 15) &&
        length(regexp_replace(b, "[^0-9]", "")) >= 2 &&
        length(b) - length(regexp_replace(b, "\\p{L}", "")) >= 2
    coalesce(get(filter(brackets, isCat), lit(0)), lit(""))
  }

  /** X6: NOT_A_CONVENTION blocklist — dates, "NA", rip-quality
    * tokens (info_scanner_ph2.py:41-46). */
  private val NotAConvention =
    "(?i)^\\s*(?:\\d{4}(?:[.\\-/]\\d{1,2}){0,2}|na)\\s*$" +
      "|(?i)\\b(?:cdr?|web|dvd|dl|flac|mp3|wav|wv|m4a|aac|ogg|opus|lossless" +
      "|v0|vbr|hi-?res|24-?bit|16-?bit|no\\s*log|scans?)\\b"

  /** X6: event/convention from brackets — after removing the catalog
    * number and blocklist, a lone short bracket, else the first short
    * bracket with ≥1 digit (incl. kanji numerals) and ≥1 letter
    * (info_scanner_ph2.py:252-288). */
  def convention(brackets: Column): Column = {
    val cat = catalogNumber(brackets)
    val rest = filter(brackets, b => b =!= cat && !b.rlike(NotAConvention))
    val short = (b: Column) => length(b).between(1, 10)
    val hasDigitAndLetter = (b: Column) =>
      b.rlike("[0-9一二三四五六七八九]") && b.rlike("\\p{L}")
    when(size(rest) === 0, "")
      .when(size(rest) === 1 && short(get(rest, lit(0))), get(rest, lit(0)))
      .otherwise(coalesce(
        get(filter(rest, b => short(b) && hasDigitAndLetter(b)), lit(0)),
        lit("")))
  }

  /** X7: album-name residue — the name with every extracted bracket
    * (and its delimiters) removed, trimmed
    * (info_scanner_ph2.py:232-239). */
  def albumNameResidue(albumName: Column, brackets: Column): Column = {
    val stripped = aggregate(brackets, albumName, (acc, b) =>
      replace(replace(replace(acc, concat(lit("["), b, lit("]")), lit("")),
        concat(lit("{"), b, lit("}")), lit("")), b, lit("")))
    trim(regexp_replace(
      regexp_replace(stripped, "\\[\\s*\\]|\\{\\s*\\}", ""),
      "\\s+", " "))
  }

  /** X9: circle directory `[Name] Alias` parse
    * (artist_scanner_ph2.py:20). Returns struct(name, alias). */
  def parseCircleDir(dirName: Column): Column = struct(
    regexp_extract(dirName, "^\\[(.+?)\\]", 1).as("name"),
    trim(regexp_replace(dirName, "^\\[.+?\\]", "")).as("alias"))

  /** X21: leading-zero-trimmed index key (original_track_map.py:207).
    * "007" → "7"; all-zero → "0". */
  def trimIndexKey(idx: Column): Column = {
    val t = regexp_replace(idx, "^0+", "")
    when(t === "" && idx =!= "", "0").otherwise(t)
  }
}
