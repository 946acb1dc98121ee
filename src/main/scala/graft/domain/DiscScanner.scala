package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Disc-directory classification (SURVEY F4/F5/F6, X10).
  *
  * The regex rule families are the reference's measured spec (97.65%
  * album accuracy, disc_scanner.py:41-53) and are ported as data;
  * the execution is pure Spark columns — the whole classifier is one
  * codegen'd projection, no UDF, so it runs inside the scan at any
  * scale.
  *
  * Reference: Processor/InfoCollector/AlbumInfo/disc_scanner.py:55-187,
  * disc_auto_classify.py:45-99.
  */
object DiscScanner {

  // --- F4 rule families (disc_scanner.py:55-93), first match wins ---
  private val DiscIndex =
    "(?i)(?:disc|disk|disque|ディスク)\\s*[:：._\\-]?\\s*(?:\\d+|[a-z]\\b|one|two|three|four)" +
      "|(?i)\\bcd\\s*[:：._\\-]?\\s*\\d{1,2}\\b" +
      "|(?i)(?:^|[\\s\\-_（(【])side\\s*[:：._\\-]?\\s*(?:\\d+|[a-z]\\b|red|white|black)" +
      "|(?i)\\bfile\\s*[:：]\\s*[a-z0-9]\\b" +
      "|(?i)(?:^|[\\s\\-_（(【])[a-z]?side\\b" +
      "|(?i)chapter\\s+of\\s+"
  private val FormatToken =
    "(?i)\\b(?:mp3|wav|wave|flac|wv|m4a|aac|ogg|opus)\\b|(?i)\\d{2,3}\\s*kbps|(?i)\\b(?:16|24)\\s*bit" +
      "|(?i)\\b(?:44|48|88|96|192)(?:\\.1)?\\s*k(?:hz)?\\b|(?i)hi-?res|ハイレゾ|(?i)\\d{2}k[-_]\\d{2}"
  private val VariantToken =
    "(?i)\\bver(?:sion)?\\b|(?i)\\bvar\\b|(?i)web|(?i)booth|(?i)bandcamp|(?i)dizzylab|(?i)steam|(?i)pixiv" +
      "|\\bDL\\b|(?i)download|(?i)\\bfix\\b"
  private val BonusToken =
    "(?i)bonus|おまけ|オマケ|特典|(?i)extra|(?i)inst(?:rument)?|(?i)off\\s*vocal|オフボーカル|カラオケ" +
      "|(?i)comment|コメント|(?i)drama|ドラマ|(?i)voice|ボイス|(?i)sample|サンプル|(?i)demo|(?i)stem|(?i)secret|隠し" +
      "|(?i)promotion|(?i)xfd|(?i)crossfade|(?i)special|(?i)postcard|その他|(?i)\\bdata\\b|(?i)cd\\s*extra|(?i)omake" +
      "|(?i)trial|(?i)preview|試聴|仮歌|素材|(?i)present|(?i)liner|修正|追加|楽曲"
  private val BareDisc = "(?i)disc|disk|ディスク"

  /** F4: does a directory name denote a disc? Ordered first-match-wins
    * chain — DISC_INDEX beats FORMAT ("DISC2 (FLAC)"), BONUS beats
    * BARE_DISC ("Bonus Disc"), FORMAT beats BARE_DISC ("WAV DISC"). */
  def looksLikeDisc(name: Column): Column =
    when(name.rlike(DiscIndex), lit(true))
      .when(name.rlike(FormatToken), lit(false))
      .when(name.rlike(VariantToken), lit(false))
      .when(name.rlike(BonusToken), lit(false))
      .otherwise(name.rlike(BareDisc))

  // --- F5 veto (disc_scanner.py:109-133) ---
  private val DawExtensions = Seq(
    ".logicx", ".als", ".flp", ".ptx", ".cpr", ".band",
    ".reason", ".rpp", ".aup", ".sesx", ".ptf", ".song", ".dawproject")
  private val StemExport =
    "(?i)(?:^|[\\s\\-_（(【])stems?(?:$|[\\s\\-_）)】])|(?i)instrumental\\s+stems?|(?i)\\bmulti-?track"

  /** F5: why a candidate relative path can never be a disc — null when
    * nothing rules it out. Segment checks as array predicates. */
  def neverADiscReason(relPath: Column): Column = {
    val segs = filter(split(regexp_replace(relPath, "\\\\", "/"), "/"),
      s => length(s) > 0)
    val dawLit = array(DawExtensions.map(lit): _*)
    val inDaw = exists(segs, s =>
      exists(dawLit, e => lower(s).endsWith(e)))
    val lastSeg = element_at(segs, -1)
    when(size(segs) === 0, lit(null).cast("string"))
      .when(inDaw, "inside a DAW project bundle")
      .when(lastSeg.rlike(StemExport), "stem export, not a programme")
      .otherwise(lit(null).cast("string"))
  }

  /** F6: filename-encoded multi-disc detection over (albumCol,
    * fileNameCol) rows. Strict by measurement (86.9% FP rate of the
    * naive rule — disc_scanner.py:22-37): every file must match, ≥2
    * distinct disc values running 1..N, per-disc tracks distinct,
    * min 1, max ≤ 2·count. Two grouped aggregations, no UDF.
    */
  def filenameDiscs(files: DataFrame, albumCol: String,
      fileNameCol: String): DataFrame = {
    val prefix = "^(\\d{1,2})[-._ ](\\d{1,3})(?!\\d)"
    val parsed = files.select(col(albumCol).as("album"),
        regexp_extract(col(fileNameCol), prefix, 1).as("d"),
        regexp_extract(col(fileNameCol), prefix, 2).as("t"))
      .withColumn("matched", col("d") =!= "")
    val perDisc = parsed
      .groupBy(col("album"), col("d"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("t")).as("n_uniq"),
        min(nullif(col("t"), lit("")).cast("int")).as("t_min"),
        max(nullif(col("t"), lit("")).cast("int")).as("t_max"),
        min(col("matched").cast("int")).as("all_matched"))
    perDisc
      .groupBy(col("album"))
      .agg(count(lit(1)).as("n_discs"),
        sum(col("n")).as("n_files"),
        min(col("all_matched")).as("all_matched"),
        min(nullif(col("d"), lit("")).cast("int")).as("d_min"),
        max(nullif(col("d"), lit("")).cast("int")).as("d_max"),
        min((col("n") >= 2 && col("n_uniq") === col("n") &&
          col("t_min") === 1 && col("t_max") <= col("n") * 2).cast("int"))
          .as("discs_ok"))
      .select(col("album"),
        (col("all_matched") === 1 && col("n_files") >= 4 &&
          col("n_discs").between(2, 20) &&
          col("d_min") === 1 && col("d_max") === col("n_discs") &&
          col("discs_ok") === 1).as("filename_discs"))
  }

  /** X10: disc index from a directory name — digits-near-disc-token,
    * then letter/colour, then word/kanji numeral, then bare small int
    * (disc_auto_classify.py:45-99). Ordered regex cascade as columns. */
  def discIndexFromName(name: Column): Column = {
    val low = lower(name)
    val nearToken = regexp_extract(low,
      "(?:disc|disk|ディスク|cd|side|file)\\s*[:：._\\-（(]?\\s*(\\d{1,2})(?!\\d)", 1)
    val letterColour = regexp_extract(low,
      "(?:disc|disk|ディスク|side|file)\\s*[:：._\\-]?\\s*([a-h]|red|white|black|blue)\\b", 1)
    val glued = regexp_extract(low, "(?:^|[\\s\\-_（(【])([a-h])side\\b", 1)
    val word = regexp_extract(low,
      "(?:^|[\\s\\-_（(【:：])(one|two|three|four|five|six|seven|eight|nine|ten|壱|弐|参|一|二|三|四|五)(?:$|[\\s\\-_）)】])", 1)
    // faithful reference quirk (disc_auto_classify.py `_NUM`): no LEFT
    // digit guard, so the last 1-2 digits of a longer run match —
    // "Disc 2019" → 19 in the reference too (verified against the
    // Python regex); the verbatim-port doctrine keeps it
    val bare = regexp_extract(name, "(\\d{1,2})(?!\\d)", 1)
    val letterVal = (ascii(letterColour) - ascii(lit("a")) + 1)
    val colourVal = when(letterColour === "red", 1)
      .when(letterColour.isin("white", "black", "blue"), 2)
      .otherwise(letterVal)
    val wordVal = when(word.isin("one", "壱", "一"), 1)
      .when(word.isin("two", "弐", "二"), 2)
      .when(word.isin("three", "参", "三"), 3)
      .when(word.isin("four", "四"), 4).when(word.isin("five", "五"), 5)
      .when(word === "six", 6).when(word === "seven", 7)
      .when(word === "eight", 8).when(word === "nine", 9)
      .when(word === "ten", 10)
    val toInt = (c: Column) => nullif(c, lit("")).cast("int")
    val inRange = (c: Column) => when(c.between(1, 30), c)
    coalesce(
      inRange(toInt(nearToken)),
      when(letterColour =!= "", colourVal),
      when(glued =!= "", ascii(glued) - ascii(lit("a")) + 1),
      when(word =!= "", wordVal),
      inRange(toInt(bare)))
  }
}
