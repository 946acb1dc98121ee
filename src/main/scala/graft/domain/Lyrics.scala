package graft.domain

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §1.1 lyrics document model — the reference's deepest nested type
  * (lyrics_formatter.py:403-424 builds
  * `{section → {lang → [LyricsAnnotatedLine]}}` + a need_review flag;
  * the line/annotation shapes are LyricsAnnotatedLine.to_json and
  * RubyAnnotation.to_json, py:55-91).
  *
  * Wikitext PARSING is out of engine scope (SURVEY §2.8); what is in
  * scope is carrying this document shape through Spark losslessly:
  * a typed Dataset, a flat exploded relation for line-level
  * transforms, and an order-preserving re-nest — maps become ordered
  * struct arrays because section/line ORDER is meaningful in lyrics
  * and Spark map columns do not guarantee iteration order.
  */
object Lyrics {

  /** Ruby reading: `text` annotates `length` chars at `index`. */
  case class RubyAnnotation(index: Int, length: Int, text: String)
  case class LyricsLine(time: Option[String], text: String,
      annotations: Seq[RubyAnnotation])
  case class LangBlock(lang: String, lines: Seq[LyricsLine])
  case class LyricsSection(title: String, blocks: Seq[LangBlock])
  case class LyricsDoc(track_id: String, need_review: Boolean,
      sections: Seq[LyricsSection])

  /** The reference's on-disk JSON for one line. */
  val lineType: StructType = StructType(Seq(
    StructField("time", StringType),
    StructField("text", StringType),
    StructField("annotations", ArrayType(StructType(Seq(
      StructField("index", IntegerType),
      StructField("length", IntegerType),
      StructField("text", StringType)))))))

  /** `{section → {lang → [line]}}` as serialized by the formatter. */
  val lyricsJsonType: DataType =
    MapType(StringType, MapType(StringType, ArrayType(lineType)))

  /** Flat line-level relation: one row per (track, section, lang,
    * line) with the ordinal columns needed to re-nest losslessly.
    * Lossless for documents whose leaves are non-empty (the formatter
    * never emits an empty lang block — parse_line always yields a
    * line); a deliberately empty block has no row to carry it. */
  def explodeLines(docs: Dataset[LyricsDoc]): DataFrame =
    docs.toDF()
      .select(col("track_id"), col("need_review"),
        posexplode(col("sections")).as(Seq("section_idx", "section")))
      .select(col("track_id"), col("need_review"), col("section_idx"),
        col("section.title").as("section_title"),
        posexplode(col("section.blocks")).as(Seq("block_idx", "block")))
      .select(col("track_id"), col("need_review"), col("section_idx"),
        col("section_title"), col("block_idx"),
        col("block.lang").as("lang"),
        posexplode(col("block.lines")).as(Seq("line_idx", "line")))
      .select(col("track_id"), col("need_review"), col("section_idx"),
        col("section_title"), col("block_idx"), col("lang"), col("line_idx"),
        col("line.time").as("time"), col("line.text").as("text"),
        col("line.annotations").as("annotations"))

  /** Order-preserving re-nest of [[explodeLines]] output (three
    * bottom-up collect_list levels, each sorted by its ordinal). */
  def renest(flat: DataFrame): Dataset[LyricsDoc] = {
    val spark = flat.sparkSession
    import spark.implicits._
    flat
      .groupBy(col("track_id"), col("need_review"), col("section_idx"),
        col("section_title"), col("block_idx"), col("lang"))
      .agg(transform(array_sort(collect_list(struct(col("line_idx"),
          struct(col("time"), col("text"), col("annotations")).as("line")))),
        s => s.getField("line")).as("lines"))
      .groupBy(col("track_id"), col("need_review"), col("section_idx"),
        col("section_title"))
      .agg(transform(array_sort(collect_list(struct(col("block_idx"),
          struct(col("lang"), col("lines")).as("block")))),
        s => s.getField("block")).as("blocks"))
      .groupBy(col("track_id"), col("need_review"))
      .agg(transform(array_sort(collect_list(struct(col("section_idx"),
          struct(col("section_title").as("title"), col("blocks")).as("section")))),
        s => s.getField("section")).as("sections"))
      .as[LyricsDoc]
  }

  /** Parse the formatter's serialized JSON. The reference stores the
    * boolean `need_review` flag BESIDE the section keys in the same
    * object (lyrics_formatter.py:421), so the document is a
    * heterogeneously-valued map that `from_json` cannot type (a
    * MapType schema nulls the whole value) — one of the rare shapes
    * where per-row procedural parsing is genuinely required; json4s
    * ships with Spark, and the typed flatMap drops unparseable rows. */
  def parseLyricsJson(df: DataFrame, jsonCol: String, idCol: String): Dataset[LyricsDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(jsonCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (id, s) =>
        import org.json4s._
        implicit val fmts: Formats = DefaultFormats
        Option(s).flatMap(org.json4s.jackson.JsonMethods.parseOpt(_)).collect {
          case JObject(fields) =>
            val needReview = fields.collectFirst {
              case ("need_review", JBool(b)) => b
            }.getOrElse(false)
            val sections = fields.collect { case (title, JObject(langs)) =>
              LyricsSection(title, langs.collect { case (lang, JArray(lines)) =>
                LangBlock(lang, lines.map(_.extract[LyricsLine]))
              })
            }
            LyricsDoc(id, needReview, sections)
        }
      }
  }

  /** Render ruby readings inline: `漢字(かんじ)` — applied
    * right-to-left so earlier indices stay valid. */
  def renderRuby(line: LyricsLine): String =
    line.annotations.sortBy(a => -a.index).foldLeft(line.text) { (t, a) =>
      val end = math.min(a.index + a.length, t.length)
      t.substring(0, end) + "(" + a.text + ")" + t.substring(end)
    }
}
