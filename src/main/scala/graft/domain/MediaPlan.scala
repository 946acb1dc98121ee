package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Media-pipeline planning operators: loudness gain (X11/J6), HLS
  * base-dir collision handling (X18), shard ownership (X19/F10/A9),
  * byterange arithmetic (X15), ISO-8601 durations (X16), playlist
  * synthesis (E6). All pure transforms — the effectful encode stage
  * consumes these plans via foreachPartition (§2.11), so planning
  * scales independently of execution.
  */
object MediaPlan {

  // Reference targets: loudness_measure.py:45-46
  val TargetI = -14.0
  val TargetTp = -1.0
  val SilenceFloorLufs = -60.0
  val MaxBoostDb = 12.0

  /** X11: static gain — min(ΔI, ΔTP) capped at +12 dB boost; silence
    * (≤ -60 LUFS) and non-finite measurements get 0
    * (loudness_measure.py:76-108). Nulls model -inf/nan (SURVEY
    * §1.2 null semantics). */
  def staticGainDb(i: Column, tp: Column): Column =
    when(i.isNull || tp.isNull || isnan(i) || isnan(tp), 0.0)
      .when(i <= SilenceFloorLufs, 0.0)
      .otherwise(least(least(lit(TargetI) - i, lit(TargetTp) - tp),
        lit(MaxBoostDb)))

  /** J6: attach gain to a worklist by source path; missing
    * measurement ⇒ 0 gain (transcode at original level), with the
    * miss counted for the run report (hls_assignment.py:186-210). */
  def withGain(worklist: DataFrame, loudness: DataFrame,
      pathCol: String): DataFrame =
    worklist.join(
      loudness.select(col(pathCol),
        staticGainDb(col("i"), col("tp")).as("gain_db")),
      Seq(pathCol), "left")
      .withColumn("gain_missing", col("gain_db").isNull)
      .withColumn("gain_db", coalesce(col("gain_db"), lit(0.0)))

  /** X18: collision-safe HLS base dir — the full path minus its
    * extension (which IS `<parent>/<stem>`), except when another
    * track claims the same stem (or a file of that name exists —
    * `occupied`) → `<stem> [<ext>]`
    * (hls_assignment.py:213-246). The isfile check becomes a join
    * against the file listing. */
  def hlsBaseDirs(tracks: DataFrame, pathCol: String,
      occupiedPaths: DataFrame): DataFrame = {
    val base = regexp_replace(col(pathCol), "\\.[^./]+$", "")
    val ext = lower(regexp_extract(col(pathCol), "\\.([^./]+)$", 1))
    val wStem = Window.partitionBy(col("base"))
    tracks
      .withColumn("base", base)
      .withColumn("ext", ext)
      .withColumn("n_claims", count(lit(1)).over(wStem))
      .join(occupiedPaths.select(col("path").as("base"))
        .withColumn("occupied", lit(true)), Seq("base"), "left")
      .withColumn("hls_base",
        when(col("n_claims") > 1 || col("occupied").isNotNull,
          concat(col("base"), lit(" ["), col("ext"), lit("]")))
          .otherwise(col("base")))
      .drop("n_claims", "occupied", "ext")
  }

  /** X19/F10: deterministic shard ownership — pmod(xxhash64(id), n).
    * Functionally equivalent to the reference's blake2b mod N (stable
    * across runs, derived from the key not the position —
    * hls_runner.py:43-72); in Spark this is also exactly
    * `repartition(n, col)`'s contract. */
  def shardIndex(id: Column, shardCount: Int): Column =
    pmod(xxhash64(id), lit(shardCount.toLong)).cast("int")

  /** A9: shard-bucket accounting — per (shard, subshard of 8) counts
    * and completion sums (shard_math.py:36-77; the reference nests
    * them the other way — 8 blake2b buckets with shard = bucket % 2 —
    * but our API generalizes over shardCount). The subshard hash is
    * SALTED: deriving both levels from the same unsalted hash makes
    * subshard ≡ shard (mod gcd(shardCount, 8)) — at shardCount 16
    * every shard "contained" exactly one non-empty subshard and the
    * breakdown carried zero information. */
  def shardAccounting(df: DataFrame, idCol: String, shardCount: Int,
      doneCol: String): DataFrame =
    df.groupBy(shardIndex(col(idCol), shardCount).as("shard"),
        pmod(xxhash64(lit("sub"), col(idCol)), lit(8L)).cast("int")
          .as("subshard"))
      .agg(count(lit(1)).as("n"), sum(col(doneCol).cast("int")).as("n_done"))

  /** X15: HLS byterange `LEN@OFF`, offset optional ⇒ the byte after
    * the previous segment's (possibly explicit) end — i.e. offsets
    * CHAIN from the last explicit offset, they are not a global
    * running sum (dash-repackage.py:27-42: `start = prev_end + 1`).
    *
    * Windowed closed form: with cum = Σ lengths before this row and
    * j the last explicitly-offset row at/before it,
    * `off = explicit_off(j) − cum(j) + cum` (and 0 before any
    * explicit row, matching the reference's initial prev_end = −1).
    */
  def resolveByteranges(segments: DataFrame, groupCol: String,
      seqCol: String, byterangeCol: String): DataFrame = {
    val len = split(col(byterangeCol), "@").getItem(0).cast("long")
    val off = when(col(byterangeCol).contains("@"),
      split(col(byterangeCol), "@").getItem(1).cast("long"))
    val wPrev = Window.partitionBy(col(groupCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.partitionBy(col(groupCol)).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    segments
      .withColumn("seg_len", len)
      .withColumn("explicit_off", off)
      .withColumn("__cum", coalesce(sum(col("seg_len")).over(wPrev), lit(0L)))
      .withColumn("__delta",
        last(col("explicit_off") - col("__cum"), ignoreNulls = true).over(wCur))
      .withColumn("resolved_off", coalesce(col("__delta"), lit(0L)) + col("__cum"))
      .drop("explicit_off", "__cum", "__delta")
  }

  /** X16: float seconds → ISO-8601 duration "PT<h>H<m>M<s[.fff]>S"
    * (dash-repackage.py:18-24). */
  def secondsToIso8601(sec: Column): Column = {
    val h = floor(sec / 3600).cast("long")
    val m = floor((sec % 3600) / 60).cast("long")
    val s = round(sec % 60, 3)
    concat(lit("PT"),
      when(h > 0, concat(h, lit("H"))).otherwise(lit("")),
      when(m > 0 || h > 0, concat(m, lit("M"))).otherwise(lit("")),
      when(s === s.cast("long"), concat(s.cast("long"), lit("S")))
        .otherwise(concat(s, lit("S"))))
  }

  /** E6: master-playlist text per track from its quality ladder —
    * string-template synthesis (hls_finalizer.py:28-81 shape). */
  def masterPlaylist(bitratesKbps: Column): Column = {
    val entries = transform(array_sort(bitratesKbps), b =>
      concat(lit("#EXT-X-STREAM-INF:BANDWIDTH="), (b * 1000).cast("long"),
        lit(",CODECS=\"mp4a.40.2\"\n"), b.cast("string"), lit("k/media.m3u8")))
    concat(lit("#EXTM3U\n#EXT-X-VERSION:7\n"), array_join(entries, "\n"))
  }

  /** DASH timescale (dash-repackage.py:24). */
  val MpdTimescale = 48000L

  /** E6 (MPD half): the DASH manifest document per track from its
    * representation ladder — one codegen'd string expression,
    * byte-identical to the reference's ElementTree + minidom
    * pretty-print (dash-repackage.py:73-154; pinned against a fixture
    * generated by that algorithm).
    *
    * `reps` is `ARRAY<STRUCT>` with per-representation fields:
    * bandwidth LONG, base_url, layout ('single_file'|'template'),
    * durations ARRAY<DOUBLE>, and per layout: media_file +
    * init_start/init_end + ranges ARRAY<STRUCT<s,e>> (single-file →
    * SegmentList with mediaRanges — SegmentTemplate cannot express
    * byte ranges), or init_file + segment_template (→
    * SegmentTemplate). Durations scale by [[MpdTimescale]] with
    * HALF_EVEN rounding (`bround` ≡ Python round);
    * mediaPresentationDuration truncates whole seconds like the
    * reference's `PT{int(total)}S`. */
  def mpdDocument(reps: Column): Column = {
    val tsAttr = s"""timescale="$MpdTimescale""""
    def segTimeline(r: Column, indent: String): Column = concat(
      lit(s"$indent<SegmentTimeline>\n"),
      array_join(transform(r.getField("durations"), d =>
        concat(lit(s"""$indent  <S d=""""),
          bround(d * MpdTimescale).cast("long"), lit("\"/>"))), "\n"),
      lit(s"\n$indent</SegmentTimeline>"))
    def singleFile(r: Column): Column = concat(
      lit(s"        <SegmentList $tsAttr>\n"),
      lit("          <Initialization sourceURL=\""), r.getField("media_file"),
      lit("\" range=\""), r.getField("init_start"), lit("-"),
      r.getField("init_end"), lit("\"/>\n"),
      segTimeline(r, "          "), lit("\n"),
      array_join(transform(r.getField("ranges"), g =>
        concat(lit("          <SegmentURL media=\""), r.getField("media_file"),
          lit("\" mediaRange=\""), g.getField("s"), lit("-"),
          g.getField("e"), lit("\"/>"))), "\n"),
      lit("\n        </SegmentList>"))
    def template(r: Column): Column = concat(
      lit("        <SegmentTemplate initialization=\""), r.getField("init_file"),
      lit("\" media=\""), r.getField("segment_template"),
      lit(s"""" startNumber="0" $tsAttr>\n"""),
      segTimeline(r, "          "),
      lit("\n        </SegmentTemplate>"))
    val repXml = transform(reps, r => concat(
      lit("      <Representation id=\""), r.getField("bandwidth"),
      lit("\" bandwidth=\""), r.getField("bandwidth"), lit("\">\n"),
      lit("        <BaseURL>"), r.getField("base_url"), lit("</BaseURL>\n"),
      when(r.getField("layout") === "single_file", singleFile(r))
        .otherwise(template(r)),
      lit("\n      </Representation>")))
    val maxTotal = array_max(transform(reps, r =>
      aggregate(r.getField("durations"), lit(0.0), (a, d) => a + d)))
    concat(
      lit("<?xml version=\"1.0\" ?>\n" +
        "<MPD xmlns=\"urn:mpeg:dash:schema:mpd:2011\" " +
        "profiles=\"urn:mpeg:dash:profile:isoff-on-demand:2011\" " +
        "type=\"static\" minBufferTime=\"PT1.5S\" " +
        "mediaPresentationDuration=\"PT"),
      floor(maxTotal).cast("long"),
      lit("S\">\n  <Period start=\"PT0S\">\n" +
        "    <AdaptationSet mimeType=\"audio/mp4\" codecs=\"mp4a.40.2\" " +
        "startWithSAP=\"1\" segmentAlignment=\"true\" lang=\"en\">\n"),
      array_join(repXml, "\n"),
      lit("\n    </AdaptationSet>\n  </Period>\n</MPD>\n"))
  }
}
