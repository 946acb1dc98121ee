package graft.queries

import graft.Tables
import graft.domain.{CatalogExtract, DiscScanner}
import graft.operators.{Grouping, Resume}
import graft.sources.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The COMPOSED catalog pipeline under the oracle gate (SURVEY §7
  * phase 2): one query that chains the ph1→ph3 operators end-to-end —
  * listing synthesis → F1 extension whitelist → X1 filename parse →
  * F4/X10 disc classification → A1/A2 majority-vote imputation → A3
  * ordinal gap fill → A4/A5 canonicalization → §2.3 resume anti-join —
  * so COLUMN DRIFT BETWEEN STAGES fails the gate, not just
  * per-operator specs.
  *
  * The catalog tree is synthesized deterministically from
  * lineitem⋈orders (every row formula is reproducible in ANSI SQL), so
  * the DuckDB oracle can re-derive the expected output of the whole
  * chain from the SAME generating columns: the Spark side genuinely
  * round-trips through strings (builds `(NN) [artist] title.flac`
  * names, re-parses them, classifies `Disc N` dirs with the real regex
  * cascades), and any drift between what a stage emits and what the
  * next consumes breaks the hash match. Regex-parity across engines is
  * deliberately NOT exercised here (pinned by the CJK fixture specs);
  * the oracle mirrors semantics, not mechanism.
  */
object PipelineQueries {

  // shared synthesis formulas (all from o_orderkey/o_custkey/lineitem
  // keys; duplicated verbatim in the oracle SQL)
  private def circleC = concat(lit("circle "), (col("o_custkey") % 97).cast("string"))
  private def dateheadC =
    concat(lit("2024."), lpad(((col("o_orderkey") % 9) + 1).cast("string"), 2, "0"))
  private def catC =
    concat(lit("CAT-"), lpad((col("o_orderkey") % 500).cast("string"), 4, "0"))
  private def albumC = concat(dateheadC, lit(" [EV"),
    (col("o_orderkey") % 30).cast("string"), lit("] ["), catC,
    lit("] album "), col("o_orderkey").cast("string"))

  /** The full chain; ~1 row per lineitem line plus per-album junk rows
    * that F1 must drop. */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    // Deliberately NOT persisted: the downstream stages re-derive the
    // listing per consumer, but measured at sf0.1 the parquet re-scan
    // (columnar, fused codegen) beats reading any cached form —
    // full-string cache 2×, numeric-only cache 1.6× slower end-to-end —
    // because every consumer prunes to a different narrow column set
    // that the cache would deserialize in full. Both album-side
    // relations BROADCAST (albums ≪ tracks — the J1 FK shape): the
    // per-album line count is a pre-aggregated broadcast join, not a
    // count window, so no consumer pays a full shuffle+sort of the
    // track rows just to annotate album arity.
    val nl = t.lineitem.groupBy(col("l_orderkey").as("nl_orderkey"))
      .agg(count(lit(1)).as("nlines"))
    val lines = t.lineitem
      .join(broadcast(t.orders.select(col("o_orderkey"), col("o_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nl), col("l_orderkey") === col("nl_orderkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("o_orderkey"),
        col("o_custkey"), col("nlines"))
    val discDir = when(col("nlines") > 4,
      when(col("l_linenumber") <= 3, "Disc 1")
        .when(col("l_linenumber") === 4, "Bonus Disc")
        .otherwise("Disc 2")).otherwise("")
    // (l_orderkey, l_linenumber) is NOT unique in the generated data;
    // (l_partkey, l_suppkey, l_linenumber) per order is (the q27
    // lesson) — fold all three into the name so file_name is unique
    // within its group and the gap-fill ordering is total
    val fileName = when(col("l_quantity") < 3,
      concat(lit("untagged take "), col("l_linenumber").cast("string"),
        lit(" piece "), col("l_partkey").cast("string"),
        lit("-"), col("l_suppkey").cast("string"), lit(".flac")))
      .otherwise(concat(lit("("), lpad(col("l_linenumber").cast("string"), 2, "0"),
        lit(") [artist "), (col("l_suppkey") % 13).cast("string"),
        lit("] piece "), col("l_partkey").cast("string"),
        lit("-"), col("l_suppkey").cast("string"), lit(".flac")))
    val tdate0 = when(col("l_quantity") >= 48, lit(null).cast("string"))
      .when(col("l_linenumber") === 1, "2023.12")
      .otherwise(dateheadC)
    val listing = lines.select(circleC.as("circle"), albumC.as("album"),
      catC.as("catalog_no"), discDir.as("disc_dir"), fileName.as("file_name"),
      tdate0.as("tdate0"))
    // per-album artwork/notes rows: real files in a real tree that the
    // extension whitelist must drop before any track logic runs
    val junk = t.orders.select(circleC.as("circle"), albumC.as("album"),
      catC.as("catalog_no"), lit("").as("disc_dir"),
      explode(array(lit("folder.jpg"), lit("notes.txt"))).as("file_name"),
      lit(null).cast("string").as("tdate0"))
    val files = listing.unionByName(junk)
      .withColumn("ext", lower(regexp_extract(col("file_name"), "\\.([^.]+)$", 1)))

    // F1: extension whitelist
    val audio = Corpus.audioFiles(files)
    // X1: re-parse the synthesized filenames through the real regex
    val parsed = audio
      .withColumn("p", CatalogExtract.parseTrackFilename(col("file_name")))
      .withColumn("no", coalesce(col("p.track"), lit(-1)))
      .drop("p")
    // F4 + X10: disc classification via the real rule cascades
    // ("Bonus Disc" must classify as NOT a disc → index 0)
    val classified = parsed.withColumn("disc_idx",
      when(DiscScanner.looksLikeDisc(col("disc_dir")),
        DiscScanner.discIndexFromName(col("disc_dir")).cast("int"))
        .otherwise(lit(0)))
    // A1+A2: impute missing release dates from the album majority
    val imputed = Grouping.imputeByMajority(classified,
      Seq("circle", "album"), "tdate0")
    // A3: lowest-unused track numbers per (circle, album, disc)
    val filled = Grouping.gapFillNumbers(imputed,
      Seq("circle", "album", "disc_dir"), "no", "file_name")
    // A4/A5: canonical album per catalog number (first by name)
    val canon = Grouping.canonicalize(filled, Seq("catalog_no"),
      Seq(col("album")), Seq("album"))
    // §2.3: resume anti-join against the completed-albums artifact
    val completed = t.orders.filter(col("o_orderkey") % 10 === 0)
      .select(circleC.as("circle"), albumC.as("album"))
    Resume.pending(canon, completed, Seq("circle", "album"))
      .select(col("circle"), col("album"), col("catalog_no"),
        col("disc_dir"), col("disc_idx"), col("file_name"),
        col("no").cast("int").as("track_no"),
        col("tdate0").as("release_date"), col("canonical_album"))
      .orderBy(col("circle"), col("album"), col("disc_dir"), col("file_name"))
  }

  // The oracle re-derives every stage from the generating columns:
  // parse ≡ the untagged/numbered CASE, disc classification ≡ the
  // disc_dir CASE, then majority vote / gap fill / canonicalization /
  // resume as explicit SQL.
  private val q36Sql =
    """WITH lines AS (
      |  SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
      |    l.l_quantity, o.o_custkey,
      |    count(*) OVER (PARTITION BY l.l_orderkey) AS nlines
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |base AS (
      |  SELECT
      |    'circle ' || CAST(o_custkey % 97 AS VARCHAR) AS circle,
      |    '2024.' || lpad(CAST((l_orderkey % 9) + 1 AS VARCHAR), 2, '0')
      |      || ' [EV' || CAST(l_orderkey % 30 AS VARCHAR) || '] [CAT-'
      |      || lpad(CAST(l_orderkey % 500 AS VARCHAR), 4, '0')
      |      || '] album ' || CAST(l_orderkey AS VARCHAR) AS album,
      |    'CAT-' || lpad(CAST(l_orderkey % 500 AS VARCHAR), 4, '0') AS catalog_no,
      |    CASE WHEN nlines > 4 THEN
      |      CASE WHEN l_linenumber <= 3 THEN 'Disc 1'
      |           WHEN l_linenumber = 4 THEN 'Bonus Disc'
      |           ELSE 'Disc 2' END
      |      ELSE '' END AS disc_dir,
      |    CASE WHEN nlines > 4 AND l_linenumber <= 3 THEN 1
      |         WHEN nlines > 4 AND l_linenumber > 4 THEN 2
      |         ELSE 0 END AS disc_idx,
      |    CASE WHEN l_quantity < 3
      |      THEN 'untagged take ' || CAST(l_linenumber AS VARCHAR)
      |        || ' piece ' || CAST(l_partkey AS VARCHAR)
      |        || '-' || CAST(l_suppkey AS VARCHAR) || '.flac'
      |      ELSE '(' || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')
      |        || ') [artist ' || CAST(l_suppkey % 13 AS VARCHAR)
      |        || '] piece ' || CAST(l_partkey AS VARCHAR)
      |        || '-' || CAST(l_suppkey AS VARCHAR) || '.flac' END AS file_name,
      |    CASE WHEN l_quantity < 3 THEN -1 ELSE l_linenumber END AS no,
      |    CASE WHEN l_quantity >= 48 THEN NULL
      |         WHEN l_linenumber = 1 THEN '2023.12'
      |         ELSE '2024.' || lpad(CAST((l_orderkey % 9) + 1 AS VARCHAR), 2, '0') END AS tdate0,
      |    l_orderkey
      |  FROM lines),
      |votes AS (
      |  SELECT circle, album, tdate0 AS v, count(*) AS c FROM base
      |  WHERE tdate0 IS NOT NULL AND tdate0 <> '' GROUP BY 1, 2, 3),
      |maj AS (
      |  SELECT circle, album, v AS majority FROM (
      |    SELECT circle, album, v, row_number() OVER (
      |      PARTITION BY circle, album ORDER BY c DESC, v ASC) AS rn
      |    FROM votes) WHERE rn = 1),
      |imp AS (
      |  SELECT b.*, CASE WHEN b.tdate0 IS NULL OR b.tdate0 = ''
      |    THEN m.majority ELSE b.tdate0 END AS release_date
      |  FROM base b LEFT JOIN maj m
      |    ON m.circle = b.circle AND m.album = b.album),
      |sizes AS (
      |  SELECT circle, album, disc_dir, count(*) AS n,
      |    coalesce(max(CASE WHEN no >= 1 THEN no END), 0) AS maxv
      |  FROM imp GROUP BY 1, 2, 3),
      |cand AS (
      |  SELECT circle, album, disc_dir, f, row_number() OVER (
      |    PARTITION BY circle, album, disc_dir ORDER BY f) AS rnk
      |  FROM (
      |    SELECT s.circle, s.album, s.disc_dir,
      |      unnest(generate_series(1, CAST(s.n + s.maxv AS INT))) AS f
      |    FROM sizes s) g
      |  WHERE NOT EXISTS (SELECT 1 FROM imp u
      |    WHERE u.circle = g.circle AND u.album = g.album
      |      AND u.disc_dir = g.disc_dir AND u.no = g.f)),
      |missing AS (
      |  SELECT circle, album, disc_dir, file_name, row_number() OVER (
      |    PARTITION BY circle, album, disc_dir ORDER BY file_name) AS rnk
      |  FROM imp WHERE no < 1),
      |filled AS (
      |  SELECT i.*, CASE WHEN i.no >= 1 THEN i.no ELSE c.f END AS track_no
      |  FROM imp i
      |  LEFT JOIN missing m ON i.no < 1 AND m.circle = i.circle
      |    AND m.album = i.album AND m.disc_dir = i.disc_dir
      |    AND m.file_name = i.file_name
      |  LEFT JOIN cand c ON c.circle = m.circle AND c.album = m.album
      |    AND c.disc_dir = m.disc_dir AND c.rnk = m.rnk),
      |canon AS (
      |  SELECT f.*, min(album) OVER (PARTITION BY catalog_no) AS canonical_album
      |  FROM filled f)
      |SELECT circle, album, catalog_no, disc_dir,
      |  CAST(disc_idx AS INTEGER) AS disc_idx, file_name,
      |  CAST(track_no AS INTEGER) AS track_no, release_date, canonical_album
      |FROM canon WHERE l_orderkey % 10 <> 0
      |ORDER BY circle, album, disc_dir, file_name""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q36_catalog_pipeline", q36, Some(q36Sql), headline = true))
}
