package graft.queries

import graft.Tables
import graft.operators.MediaDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal near-duplicate gate queries.
  *
  * q83 runs the REAL operator chain (synthetic frame corpus →
  * [[MediaDedup.imageDHash]] → [[MediaDedup.hammingPairs]]) under a
  * FULL DuckDB oracle: frames derive from md5 digest bytes of
  * documents.doc_id (16 bytes per digest, 66 digests per 44×24
  * frame, ~19% of ids get a brightness-perturbed "~v" variant), so
  * the oracle re-derives every pixel, tile mean, signature bit, band
  * value, bucket cull, candidate pair and hamming distance — the q70
  * discipline applied to the image modality. Real codec decode is
  * exercised by MediaDedupSpec (PNG via ImageIO, WAV via the JDK
  * sound stack) where DuckDB cannot follow.
  *
  * q88 composes both modalities end-to-end (VERDICT r9 item 3):
  * signatures → per-modality banded near-dup → ONE union edge set →
  * transitive closure → min-id survivor election → catalog join,
  * under ONE oracle. The oracle SQL is assembled from the SAME
  * fragment builders as q83/q84 ([[imageSigCtes]]/[[audioSigCtes]]/
  * [[pairCtes]]), so the signature arithmetic is single-sited — a
  * drift reaches every media oracle or none (the assignmentCtes
  * discipline).
  */
object MediaQueries {

  // ---- oracle fragment builders (single source per arithmetic) ----

  /** Image modality: media universe (parents + "~v" variants) →
    * md5-derived pixels → 4×4 tile means → 60-bit dHash. Emits
    * `<p>media`, `<p>px`, `<p>tiles`, `<p>sigs` (media_id, sig),
    * trailing comma. */
  private def imageSigCtes(p: String): String =
    s"""${p}media AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS media_id, CAST(NULL AS VARCHAR) AS parent
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id AS VARCHAR) || '~v', CAST(doc_id AS VARCHAR)
       |  FROM documents
       |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
       |    1, 2)) AS INTEGER) < 48),
       |${p}px AS (
       |  SELECT media_id,
       |    [least(255,
       |       CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':px:' ||
       |         CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER)
       |       + CASE WHEN parent IS NOT NULL AND
       |           CAST(('0x' || substring(md5(media_id || ':pt:' ||
       |             CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER) < 3
       |         THEN 80 ELSE 0 END)
       |     for i in generate_series(1, 1056)] AS p
       |  FROM ${p}media),
       |${p}tiles AS (
       |  SELECT media_id,
       |    [list_sum(flatten([[p[(((t-1)//11)*4 + dy)*44 + ((t-1)%11)*4 + dx + 1]
       |        for dx in generate_series(0,3)] for dy in generate_series(0,3)])) // 16
       |     for t in generate_series(1, 66)] AS avgs
       |  FROM ${p}px),
       |${p}sigs AS MATERIALIZED (
       |  SELECT media_id,
       |    CAST(list_sum([CASE WHEN avgs[((k-1)//10)*11 + (k-1)%10 + 2] >
       |                        avgs[((k-1)//10)*11 + (k-1)%10 + 1]
       |      THEN CAST(1 AS BIGINT) << (k-1) ELSE CAST(0 AS BIGINT) END
       |      for k in generate_series(1, 60)]) AS BIGINT) AS sig
       |  FROM ${p}tiles),
       |""".stripMargin

  /** Audio modality: media universe (parents + "~a" variants) →
    * md5-derived RMS envelope (61 windows) → 60-bit gradient sig.
    * Emits `<p>media`, `<p>env`, `<p>steps`, `<p>sigs`, trailing
    * comma. */
  private def audioSigCtes(p: String): String =
    s"""${p}media AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS media_id, CAST(NULL AS VARCHAR) AS parent
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id AS VARCHAR) || '~a', CAST(doc_id AS VARCHAR)
       |  FROM documents
       |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
       |    1, 2)) AS INTEGER) < 48),
       |${p}env AS (
       |  SELECT media_id, k AS frameIdx,
       |    (CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':env:' ||
       |       CAST(k AS VARCHAR)), 1, 2)) AS INTEGER)
       |     + CASE WHEN parent IS NOT NULL AND
       |         CAST(('0x' || substring(md5(media_id || ':pt:' ||
       |           CAST(k AS VARCHAR)), 1, 2)) AS INTEGER) < 24
       |       THEN 32 ELSE 0 END) / 256.0 AS rms
       |  FROM ${p}media, generate_series(0, 60) AS g(k)),
       |${p}steps AS (
       |  SELECT media_id, frameIdx, rms,
       |    lead(rms) OVER (PARTITION BY media_id ORDER BY frameIdx) AS nxt
       |  FROM ${p}env),
       |${p}sigs AS MATERIALIZED (
       |  SELECT media_id, CAST(sum(CASE WHEN nxt > rms
       |    THEN CAST(1 AS BIGINT) << frameIdx ELSE CAST(0 AS BIGINT) END)
       |    AS BIGINT) AS sig
       |  FROM ${p}steps WHERE frameIdx < 60 AND nxt IS NOT NULL
       |  GROUP BY media_id),
       |""".stripMargin

  /** The shared pigeonhole pairing over a `<p>sigs` relation: 4×15
    * banding, bucket cull at 10 000, distinct candidate pairs,
    * popcount verify at hamming ≤ 3. Emits `<p>banded`, `<p>sized`,
    * `<p>pairs` (a_id, b_id, hamming), trailing comma. */
  private def pairCtes(p: String): String =
    s"""${p}banded AS (
       |  SELECT media_id, b AS band, (sig >> (b*15)) & 32767 AS bv
       |  FROM ${p}sigs, generate_series(0,3) AS g(b)),
       |${p}sized AS (
       |  SELECT media_id, band, bv FROM ${p}banded
       |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
       |${p}pairs AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |  FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM ${p}sized x JOIN ${p}sized y
       |      ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id) c
       |  JOIN ${p}sigs a ON a.media_id = c.a_id
       |  JOIN ${p}sigs b ON b.media_id = c.b_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
       |""".stripMargin

  /** q83: perceptual image near-dup — 60-bit integer dHash over the
    * synthetic frame corpus, 4×15-band pigeonhole pairing, popcount
    * verify at hamming ≤ 3. Planted variants mostly land within the
    * threshold (a handful sit honestly beyond it — the cut is real);
    * unrelated frames sit near hamming 30 and never pair.
    */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    MediaDedup.hammingPairs(
        MediaDedup.imageDHash(MediaDedup.syntheticFrameCorpus(ids)),
        maxHamming = 3)
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q83Sql =
    s"""WITH ${imageSigCtes("")}${pairCtes("")}
       |fin AS (SELECT a_id, b_id, hamming FROM pairs)
       |SELECT a_id, b_id, hamming FROM fin
       |ORDER BY a_id, b_id""".stripMargin

  /** The q84 synthetic envelope relation — md5-derived 61-window RMS
    * per media (parents + "~a" loudness-perturbed variants), shared
    * by the q84 single-stage gate and the q88 composed pipeline so
    * the generated corpus cannot drift between them. */
  private def syntheticEnvelope(s: SparkSession, dir: String,
      windows: Int = 61, perturbBar: Int = 24): DataFrame = {
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string").as("pid"))
    def hexByte(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 2), 16, 10).cast("int")
    val parents = ids.select(col("pid").as("media_id"),
      lit(null).cast("string").as("parent"))
    val variants = ids
      .filter(hexByte(concat(col("pid"), lit(":var"))) < 48)
      .select(concat(col("pid"), lit("~a")).as("media_id"),
        col("pid").as("parent"))
    parents.unionByName(variants)
      .select(col("media_id"), col("parent"),
        explode(sequence(lit(0), lit(windows - 1))).as("frameIdx"))
      .withColumn("rms",
        (hexByte(concat(coalesce(col("parent"), col("media_id")),
          lit(":env:"), col("frameIdx").cast("string")))
          + when(col("parent").isNotNull &&
              hexByte(concat(col("media_id"), lit(":pt:"),
                col("frameIdx").cast("string"))) < perturbBar, 32)
            .otherwise(0)) / lit(256.0))
      .select(col("media_id"), col("frameIdx"), col("rms"))
  }

  /** q84: audio-envelope near-dup — the RELATIONAL half of the audio
    * family ([[MediaDedup.audioEnvelopeSig]] → 60-bit gradient sig →
    * the same 4×15 pigeonhole pairing) under a FULL oracle: envelopes
    * derive from md5 bytes of doc_id (61 windows, ~19% of ids get a
    * loudness-perturbed "~a" variant), integer-valued rms/256 doubles
    * so every comparison is exact in both engines. The CODEC half
    * (WAV PCM decode → RMS) is spec-verified where DuckDB cannot
    * follow (MediaDedupSpec's gained+shifted WAV re-encode).
    */
  private def q84(s: SparkSession, dir: String): DataFrame =
    MediaDedup.hammingPairs(
        MediaDedup.audioEnvelopeSig(syntheticEnvelope(s, dir)),
        maxHamming = 3)
      .orderBy(col("a_id"), col("b_id"))

  private val q84Sql =
    s"""WITH ${audioSigCtes("")}${pairCtes("")}
       |fin AS (SELECT a_id, b_id, hamming FROM pairs)
       |SELECT a_id, b_id, hamming FROM fin
       |ORDER BY a_id, b_id""".stripMargin

  /** q88: the COMPOSED multimodal pipeline under ONE oracle
    * ([[MediaDedup.crossModalDupGroups]]): image dHash + audio
    * envelope signatures over the same underlying documents →
    * per-modality banded near-dup → union edge set → transitive
    * closure (a parent, its "~v" image variant and its "~a" audio
    * variant collapse into ONE group — the cross-modal join no
    * single-modality gate exercises) → min-media_id survivor →
    * join back to the documents catalog (lang, source). The oracle
    * re-derives every stage including the recursive closure and the
    * final catalog join, so inter-stage column drift fails the hash.
    */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    val imageSigs = MediaDedup.imageDHash(
        MediaDedup.syntheticFrameCorpus(ids))
      .select(col("media_id"), col("sig"))
    val audioSigs = MediaDedup.audioEnvelopeSig(syntheticEnvelope(s, dir))
    MediaDedup.crossModalDupGroups(Seq(imageSigs, audioSigs))
      .withColumn("parent_doc",
        substring_index(col("media_id"), "~", 1).cast("long"))
      .join(Tables(s, dir).documents
        .select(col("doc_id").as("parent_doc"), col("lang"), col("source")),
        Seq("parent_doc"))
      .select(col("media_id"), col("parent_doc"), col("lang"),
        col("source"), col("group_id"), col("group_size"), col("keep"))
      .orderBy(col("media_id"))
  }

  private val q88Sql =
    s"""WITH RECURSIVE ${imageSigCtes("im_")}${pairCtes("im_")}${audioSigCtes("au_")}${pairCtes("au_")}
       |edges AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a_id AS a, b_id AS b FROM im_pairs
       |    UNION ALL SELECT b_id, a_id FROM im_pairs
       |    UNION ALL SELECT a_id, b_id FROM au_pairs
       |    UNION ALL SELECT b_id, a_id FROM au_pairs)),
       |walk(node, label) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
       |comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
       |-- DISTINCT is explicit (not a bare UNION): inside a WITH
       |-- RECURSIVE block DuckDB 1.0 gives sibling UNION CTEs
       |-- append-like semantics, so a plain UNION here leaked
       |-- duplicate media rows (observed 1194 vs 694)
       |universe AS (
       |  SELECT DISTINCT media_id FROM (
       |    SELECT media_id FROM im_sigs
       |    UNION ALL SELECT media_id FROM au_sigs)),
       |assigned AS (
       |  SELECT u.media_id,
       |    coalesce(c.component, u.media_id) AS group_id
       |  FROM universe u LEFT JOIN comp c ON c.node = u.media_id),
       |gsz AS (SELECT group_id, count(*) AS group_size
       |  FROM assigned GROUP BY 1)
       |SELECT a.media_id,
       |  CAST(split_part(a.media_id, '~', 1) AS BIGINT) AS parent_doc,
       |  d.lang, d.source, a.group_id, z.group_size,
       |  a.media_id = a.group_id AS keep
       |FROM assigned a
       |JOIN gsz z USING (group_id)
       |JOIN documents d ON d.doc_id = CAST(split_part(a.media_id, '~', 1) AS BIGINT)
       |ORDER BY a.media_id""".stripMargin

  /** q89: VIDEO containment near-dup under a FULL oracle
    * ([[MediaDedup.videoContainmentPairs]]): 6 md5-derived frames
    * per parent video, a 4-frame trimmed+brightness-perturbed clip
    * for the ~19% variant subset; frame-level pigeonhole pairing at
    * hamming ≤ 3, then per-media-pair containment (max coverage
    * ratio — the trimmed side's coverage is what makes sub-clips
    * findable). The oracle re-derives every pixel, tile, signature
    * bit, frame pair, DISTINCT-frame count and coverage division.
    */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    MediaDedup.videoContainmentPairs(
        MediaDedup.imageDHash(MediaDedup.syntheticVideoCorpus(ids)),
        minContainment = 0.5)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q103: the AUTO-WIDTH door under a FULL oracle (round 13 —
    * VERDICT r12 item 2 carried to the gate): the q89 chain entered
    * through [[graft.operators.MediaDedup.videoContainmentPairsAuto]]
    * — the door counts the frame corpus, sizes the signature width
    * ([[graft.operators.MediaDedup.sigSpecFor]] — gate corpora sit
    * far inside the 60-bit ceiling, so it picks Sig60) and runs the
    * WIDE kernel at the chosen spec. The oracle is q89's text
    * verbatim: the door's near-boundary dispatch must reproduce the
    * legacy 60-bit chain value-for-value from the parquet bytes
    * (Sig60-through-the-wide-kernel ≡ legacy, the round-12 parity,
    * now hash-gated); the far side of the boundary is q96's wide
    * gate + the MediaDedupSpec forced-n parity, so BOTH dispatch
    * arms are value-verified.
    */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    MediaDedup.videoContainmentPairsAuto(
        MediaDedup.syntheticVideoCorpus(ids), minContainment = 0.5)
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q89Sql =
    """WITH vmedia AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
      |    CAST(NULL AS VARCHAR) AS parent, 6 AS nf
      |  FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) || '~t', CAST(doc_id AS VARCHAR), 4
      |  FROM documents
      |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
      |    1, 2)) AS INTEGER) < 48),
      |vframes AS (
      |  SELECT media_id, parent, k,
      |    CASE WHEN parent IS NULL THEN k ELSE k + 1 END AS src
      |  FROM vmedia, generate_series(0, 5) AS g(k) WHERE k < nf),
      |vpx AS (
      |  SELECT media_id, k,
      |    [least(255,
      |       CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':f' ||
      |         CAST(src AS VARCHAR) || ':px:' ||
      |         CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER)
      |       + CASE WHEN parent IS NOT NULL AND
      |           CAST(('0x' || substring(md5(media_id || ':f' ||
      |             CAST(k AS VARCHAR) || ':pt:' ||
      |             CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER) < 3
      |         THEN 80 ELSE 0 END)
      |     for i in generate_series(1, 1056)] AS p
      |  FROM vframes),
      |vtiles AS (
      |  SELECT media_id, k,
      |    [list_sum(flatten([[p[(((t-1)//11)*4 + dy)*44 + ((t-1)%11)*4 + dx + 1]
      |        for dx in generate_series(0,3)] for dy in generate_series(0,3)])) // 16
      |     for t in generate_series(1, 66)] AS avgs
      |  FROM vpx),
      |vsigs AS MATERIALIZED (
      |  SELECT media_id, k,
      |    CAST(list_sum([CASE WHEN avgs[((b-1)//10)*11 + (b-1)%10 + 2] >
      |                        avgs[((b-1)//10)*11 + (b-1)%10 + 1]
      |      THEN CAST(1 AS BIGINT) << (b-1) ELSE CAST(0 AS BIGINT) END
      |      for b in generate_series(1, 60)]) AS BIGINT) AS sig
      |  FROM vtiles),
      |vbanded AS (
      |  SELECT media_id, k, b AS band, (sig >> (b*15)) & 32767 AS bv
      |  FROM vsigs, generate_series(0,3) AS g(b)),
      |vsized AS (
      |  SELECT media_id, k, band, bv FROM vbanded
      |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
      |vpairs AS (
      |  SELECT c.am, c.af, c.bm, c.bf
      |  FROM (
      |    SELECT DISTINCT x.media_id AS am, x.k AS af,
      |      y.media_id AS bm, y.k AS bf
      |    FROM vsized x JOIN vsized y
      |      ON x.band = y.band AND x.bv = y.bv
      |      AND (x.media_id, x.k) < (y.media_id, y.k)) c
      |  JOIN vsigs a ON a.media_id = c.am AND a.k = c.af
      |  JOIN vsigs b ON b.media_id = c.bm AND b.k = c.bf
      |  WHERE bit_count(xor(a.sig, b.sig)) <= 3 AND c.am <> c.bm),
      |vagg AS (
      |  SELECT am AS a_id, bm AS b_id,
      |    count(DISTINCT af) AS a_matched, count(DISTINCT bf) AS b_matched
      |  FROM vpairs GROUP BY 1, 2),
      |vcnt AS (SELECT media_id, count(DISTINCT k) AS nfr FROM vsigs GROUP BY 1)
      |SELECT a_id, b_id, a_matched, b_matched,
      |  ca.nfr AS a_frames, cb.nfr AS b_frames,
      |  round(greatest(CAST(a_matched AS DOUBLE) / ca.nfr,
      |    CAST(b_matched AS DOUBLE) / cb.nfr), 6) AS containment
      |FROM vagg
      |JOIN vcnt ca ON ca.media_id = a_id
      |JOIN vcnt cb ON cb.media_id = b_id
      |WHERE greatest(CAST(a_matched AS DOUBLE) / ca.nfr,
      |  CAST(b_matched AS DOUBLE) / cb.nfr) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** q94: BATCH media admission under ONE oracle
    * ([[MediaDedup.admitIncremental]] — the admission grid's last
    * empty cell, VERDICT r10 item 5): corpus = the parent-frame
    * signatures (pairwise non-dup at hamming 3 by the q83-corpus
    * construction — its own survivor set), batch = the planted "~v"
    * variants; admission does only new×new and new×corpus banded
    * work with corpus node-hashes negated into the disjoint key
    * space. The oracle re-derives every pixel, signature, band,
    * union-population cull, split candidate join, popcount verify,
    * the recursive closure over md5-60 node hashes and the
    * min-STRING-id admission rule (the crossModalDupGroups group
    * identity, which is what the spec-pinned batch-twin equivalence
    * is stated against). Most variants reject against their parent;
    * the hamming>3 outliers admit — the gate rows are the real cut.
    */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    val sigs = graft.CacheScope.track(
      MediaDedup.imageDHash(MediaDedup.syntheticFrameCorpus(ids))
        .select(col("media_id"), col("sig")))
    MediaDedup.admitIncremental(
        sigs.filter(col("media_id").endsWith("~v")),
        sigs.filter(!col("media_id").endsWith("~v")))
      .select(col("media_id")).orderBy(col("media_id"))
  }

  private val q94Sql = {
    def h(c: String) =
      s"CAST(('0x' || substring(md5($c), 1, 15)) AS BIGINT)"
    s"""WITH RECURSIVE ${imageSigCtes("")}
       |fsig AS MATERIALIZED (
       |  SELECT media_id, sig FROM sigs WHERE media_id LIKE '%~v'),
       |csig AS MATERIALIZED (
       |  SELECT media_id, sig FROM sigs WHERE media_id NOT LIKE '%~v'),
       |fband AS (SELECT media_id, b AS band, (sig >> (b*15)) & 32767 AS bv
       |  FROM fsig, generate_series(0,3) AS g(b)),
       |cband AS (SELECT media_id, b AS band, (sig >> (b*15)) & 32767 AS bv
       |  FROM csig, generate_series(0,3) AS g(b)),
       |obkt AS (SELECT band, bv FROM (
       |    SELECT band, bv, count(*) AS n FROM (
       |      SELECT band, bv FROM fband
       |      UNION ALL SELECT band, bv FROM cband) u
       |    GROUP BY 1, 2) WHERE n > 10000),
       |fsz AS (SELECT f.* FROM fband f
       |  LEFT JOIN obkt o ON o.band = f.band AND o.bv = f.bv
       |  WHERE o.band IS NULL),
       |csz AS (SELECT c.* FROM cband c
       |  LEFT JOIN obkt o ON o.band = c.band AND o.bv = c.bv
       |  WHERE o.band IS NULL),
       |nn AS (SELECT c2.a_id, c2.b_id FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM fsz x JOIN fsz y
       |      ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id) c2
       |  JOIN fsig a ON a.media_id = c2.a_id
       |  JOIN fsig b ON b.media_id = c2.b_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
       |nc AS (SELECT c2.a_id, c2.b_id FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM fsz x JOIN csz y ON x.band = y.band AND x.bv = y.bv) c2
       |  JOIN fsig a ON a.media_id = c2.a_id
       |  JOIN csig b ON b.media_id = c2.b_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= 3),
       |aedges AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT ${h("a_id")} AS a, ${h("b_id")} AS b FROM nn
       |  UNION ALL SELECT ${h("b_id")}, ${h("a_id")} FROM nn
       |  UNION ALL SELECT ${h("a_id")}, -${h("b_id")} - 1 FROM nc
       |  UNION ALL SELECT -${h("b_id")} - 1, ${h("a_id")} FROM nc)),
       |awalk(node, label) AS (
       |  SELECT a, a FROM aedges
       |  UNION
       |  SELECT e.b, w.label FROM awalk w JOIN aedges e ON e.a = w.node),
       |acomp AS MATERIALIZED (
       |  SELECT node, min(label) AS component FROM awalk GROUP BY node),
       |lab AS (SELECT f.media_id, c.component
       |  FROM fsig f LEFT JOIN acomp c ON c.node = ${h("f.media_id")}),
       |gmins AS (SELECT component, min(media_id) AS gmin FROM lab
       |  WHERE component IS NOT NULL AND component >= 0 GROUP BY 1)
       |SELECT l.media_id FROM lab l
       |LEFT JOIN gmins g ON g.component = l.component
       |WHERE l.component IS NULL
       |   OR (l.component >= 0 AND l.media_id = g.gmin)
       |ORDER BY media_id""".stripMargin
  }

  /** q96: video containment at the WIDE signature width (round 12 —
    * the q89 fix demonstrated end-to-end): the SAME media universe
    * as q89 (6 parent frames per doc, ~19% 4-frame trimmed+perturbed
    * clips) at [[MediaDedup.Sig120]]'s 64×32 frames → 8×16 (rows × cols) grid →
    * 120 gradient bits as 6 × 20-bit band words → wide pigeonhole
    * pairing at hamming ≤ 5 (the spec's guarantee) → the shared
    * containment tail. The oracle re-derives every pixel, tile,
    * gradient bit, band WORD, bucket cull, candidate join, per-word
    * popcount sum and coverage division — the width change keeps the
    * full-oracle discipline because the construction stayed integer.
    * The scale point (SCALE.md round 12): the 100× frame corpus that
    * 60-bit banding measurably could not survive runs here at band
    * occupancy ~3, because occupancy derives from the band WIDTH
    * (n/2²⁰), the knob [[MediaDedup.SigSpec]] frees.
    */
  private def q96(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    MediaDedup.videoContainmentPairsWide(
        MediaDedup.imageDHashWide(MediaDedup.syntheticVideoCorpusWide(ids)),
        minContainment = 0.5)
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q96Sql =
    """WITH wmedia AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS media_id,
      |    CAST(NULL AS VARCHAR) AS parent, 6 AS nf
      |  FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) || '~t', CAST(doc_id AS VARCHAR), 4
      |  FROM documents
      |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
      |    1, 2)) AS INTEGER) < 48),
      |wframes AS (
      |  SELECT media_id, parent, k,
      |    CASE WHEN parent IS NULL THEN k ELSE k + 1 END AS src
      |  FROM wmedia, generate_series(0, 5) AS g(k) WHERE k < nf),
      |wpx AS (
      |  SELECT media_id, k,
      |    [least(255,
      |       CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':f' ||
      |         CAST(src AS VARCHAR) || ':px:' ||
      |         CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER)
      |       + CASE WHEN parent IS NOT NULL AND
      |           CAST(('0x' || substring(md5(media_id || ':f' ||
      |             CAST(k AS VARCHAR) || ':pt:' ||
      |             CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER) < 3
      |         THEN 80 ELSE 0 END)
      |     for i in generate_series(1, 2048)] AS p
      |  FROM wframes),
      |wtiles AS (
      |  SELECT media_id, k,
      |    [list_sum(flatten([[p[(((t-1)//16)*4 + dy)*64 + ((t-1)%16)*4 + dx + 1]
      |        for dx in generate_series(0,3)] for dy in generate_series(0,3)])) // 16
      |     for t in generate_series(1, 128)] AS avgs
      |  FROM wpx),
      |wsigs AS MATERIALIZED (
      |  SELECT media_id, k,
      |    [CAST(list_sum([CASE WHEN
      |          avgs[(((b-1)*20 + j - 1)//15)*16 + ((b-1)*20 + j - 1)%15 + 2] >
      |          avgs[(((b-1)*20 + j - 1)//15)*16 + ((b-1)*20 + j - 1)%15 + 1]
      |        THEN CAST(1 AS BIGINT) << (j-1) ELSE CAST(0 AS BIGINT) END
      |        for j in generate_series(1, 20)]) AS BIGINT)
      |     for b in generate_series(1, 6)] AS sig
      |  FROM wtiles),
      |wbanded AS (
      |  SELECT media_id, k, b - 1 AS band, sig[b] AS bv
      |  FROM wsigs, generate_series(1, 6) AS g(b)),
      |wsized AS (
      |  SELECT media_id, k, band, bv FROM wbanded
      |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
      |wpairs AS (
      |  SELECT c.am, c.af, c.bm, c.bf
      |  FROM (
      |    SELECT DISTINCT x.media_id AS am, x.k AS af,
      |      y.media_id AS bm, y.k AS bf
      |    FROM wsized x JOIN wsized y
      |      ON x.band = y.band AND x.bv = y.bv
      |      AND (x.media_id, x.k) < (y.media_id, y.k)) c
      |  JOIN wsigs a ON a.media_id = c.am AND a.k = c.af
      |  JOIN wsigs b ON b.media_id = c.bm AND b.k = c.bf
      |  WHERE list_sum([bit_count(xor(a.sig[i], b.sig[i]))
      |      for i in generate_series(1, 6)]) <= 5
      |    AND c.am <> c.bm),
      |wagg AS (
      |  SELECT am AS a_id, bm AS b_id,
      |    count(DISTINCT af) AS a_matched, count(DISTINCT bf) AS b_matched
      |  FROM wpairs GROUP BY 1, 2),
      |wcnt AS (SELECT media_id, count(DISTINCT k) AS nfr FROM wsigs GROUP BY 1)
      |SELECT a_id, b_id, a_matched, b_matched,
      |  ca.nfr AS a_frames, cb.nfr AS b_frames,
      |  round(greatest(CAST(a_matched AS DOUBLE) / ca.nfr,
      |    CAST(b_matched AS DOUBLE) / cb.nfr), 6) AS containment
      |FROM wagg
      |JOIN wcnt ca ON ca.media_id = a_id
      |JOIN wcnt cb ON cb.media_id = b_id
      |WHERE greatest(CAST(a_matched AS DOUBLE) / ca.nfr,
      |  CAST(b_matched AS DOUBLE) / cb.nfr) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** q99: MEDIA ADMISSION AT THE WIDE SIGNATURE WIDTH (round 12 —
    * the q96 discipline carried to the admission grid's media cell,
    * which at 60 bits saturates at the same ~2M signatures the q89
    * outage measured): the q94 statement over
    * [[MediaDedup.syntheticFrameCorpusWide]] (64×32 frames, same
    * `:px:`/`:pt:` seed universe) → [[MediaDedup.imageDHashWide]]
    * ([[MediaDedup.Sig120]]: 8×16 (rows × cols) grid, 120 gradient bits, 6 ×
    * 20-bit band words) → [[MediaDedup.admitIncrementalWide]] —
    * banding is one posexplode of the word array, the verify a
    * per-word popcount sum at the pigeonhole bound (hamming ≤ 5),
    * everything after banding the SAME [[MediaDedup]] admitTail the
    * 60-bit q94 runs. The oracle re-derives every pixel, tile,
    * gradient bit, band word, union-population cull, split candidate
    * join, popcount sum, recursive closure and the min-STRING-id
    * admission rule from the parquet bytes.
    */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    val sigs = graft.CacheScope.track(
      MediaDedup.imageDHashWide(MediaDedup.syntheticFrameCorpusWide(ids))
        .select(col("media_id"), col("sig")))
    MediaDedup.admitIncrementalWide(
        sigs.filter(col("media_id").endsWith("~v")),
        sigs.filter(!col("media_id").endsWith("~v")))
      .select(col("media_id")).orderBy(col("media_id"))
  }

  /** Wide-width SINGLE-FRAME image sig fragment — the q99/q101
    * shared front: media universe (parents + "~v" variants) →
    * md5-derived 64×32 pixels → 8×16 (rows × cols) tile means →
    * [[MediaDedup.Sig120]]'s 120 gradient bits as 6 × 20-bit band
    * words. Emits `<p>media`, `<p>px`, `<p>tiles`, `<p>sigs`
    * (media_id, sig LIST), trailing comma. */
  private def imageSigCtesWide(p: String): String =
    s"""${p}media AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS media_id, CAST(NULL AS VARCHAR) AS parent
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id AS VARCHAR) || '~v', CAST(doc_id AS VARCHAR)
       |  FROM documents
       |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
       |    1, 2)) AS INTEGER) < 48),
       |${p}px AS (
       |  SELECT media_id,
       |    [least(255,
       |       CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':px:' ||
       |         CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER)
       |       + CASE WHEN parent IS NOT NULL AND
       |           CAST(('0x' || substring(md5(media_id || ':pt:' ||
       |             CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER) < 3
       |         THEN 80 ELSE 0 END)
       |     for i in generate_series(1, 2048)] AS p
       |  FROM ${p}media),
       |${p}tiles AS (
       |  SELECT media_id,
       |    [list_sum(flatten([[p[(((t-1)//16)*4 + dy)*64 + ((t-1)%16)*4 + dx + 1]
       |        for dx in generate_series(0,3)] for dy in generate_series(0,3)])) // 16
       |     for t in generate_series(1, 128)] AS avgs
       |  FROM ${p}px),
       |${p}sigs AS MATERIALIZED (
       |  SELECT media_id,
       |    [CAST(list_sum([CASE WHEN
       |          avgs[(((b-1)*20 + j - 1)//15)*16 + ((b-1)*20 + j - 1)%15 + 2] >
       |          avgs[(((b-1)*20 + j - 1)//15)*16 + ((b-1)*20 + j - 1)%15 + 1]
       |        THEN CAST(1 AS BIGINT) << (j-1) ELSE CAST(0 AS BIGINT) END
       |        for j in generate_series(1, 20)]) AS BIGINT)
       |     for b in generate_series(1, 6)] AS sig
       |  FROM ${p}tiles),
       |""".stripMargin

  private val q99Sql = {
    def h(c: String) =
      s"CAST(('0x' || substring(md5($c), 1, 15)) AS BIGINT)"
    s"""WITH RECURSIVE ${imageSigCtesWide("w")}fsig AS MATERIALIZED (
       |  SELECT media_id, sig FROM wsigs WHERE media_id LIKE '%~v'),
       |csig AS MATERIALIZED (
       |  SELECT media_id, sig FROM wsigs WHERE media_id NOT LIKE '%~v'),
       |fband AS (SELECT media_id, b - 1 AS band, sig[b] AS bv
       |  FROM fsig, generate_series(1, 6) AS g(b)),
       |cband AS (SELECT media_id, b - 1 AS band, sig[b] AS bv
       |  FROM csig, generate_series(1, 6) AS g(b)),
       |obkt AS (SELECT band, bv FROM (
       |    SELECT band, bv, count(*) AS n FROM (
       |      SELECT band, bv FROM fband
       |      UNION ALL SELECT band, bv FROM cband) u
       |    GROUP BY 1, 2) WHERE n > 10000),
       |fsz AS (SELECT f.* FROM fband f
       |  LEFT JOIN obkt o ON o.band = f.band AND o.bv = f.bv
       |  WHERE o.band IS NULL),
       |csz AS (SELECT c.* FROM cband c
       |  LEFT JOIN obkt o ON o.band = c.band AND o.bv = c.bv
       |  WHERE o.band IS NULL),
       |nn AS (SELECT c2.a_id, c2.b_id FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM fsz x JOIN fsz y
       |      ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id) c2
       |  JOIN fsig a ON a.media_id = c2.a_id
       |  JOIN fsig b ON b.media_id = c2.b_id
       |  WHERE list_sum([bit_count(xor(a.sig[i], b.sig[i]))
       |    for i in generate_series(1, 6)]) <= 5),
       |nc AS (SELECT c2.a_id, c2.b_id FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM fsz x JOIN csz y ON x.band = y.band AND x.bv = y.bv) c2
       |  JOIN fsig a ON a.media_id = c2.a_id
       |  JOIN csig b ON b.media_id = c2.b_id
       |  WHERE list_sum([bit_count(xor(a.sig[i], b.sig[i]))
       |    for i in generate_series(1, 6)]) <= 5),
       |aedges AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT ${h("a_id")} AS a, ${h("b_id")} AS b FROM nn
       |  UNION ALL SELECT ${h("b_id")}, ${h("a_id")} FROM nn
       |  UNION ALL SELECT ${h("a_id")}, -${h("b_id")} - 1 FROM nc
       |  UNION ALL SELECT -${h("b_id")} - 1, ${h("a_id")} FROM nc)),
       |awalk(node, label) AS (
       |  SELECT a, a FROM aedges
       |  UNION
       |  SELECT e.b, w.label FROM awalk w JOIN aedges e ON e.a = w.node),
       |acomp AS MATERIALIZED (
       |  SELECT node, min(label) AS component FROM awalk GROUP BY node),
       |lab AS (SELECT f.media_id, c.component
       |  FROM fsig f LEFT JOIN acomp c ON c.node = ${h("f.media_id")}),
       |gmins AS (SELECT component, min(media_id) AS gmin FROM lab
       |  WHERE component IS NOT NULL AND component >= 0 GROUP BY 1)
       |SELECT l.media_id FROM lab l
       |LEFT JOIN gmins g ON g.component = l.component
       |WHERE l.component IS NULL
       |   OR (l.component >= 0 AND l.media_id = g.gmin)
       |ORDER BY media_id""".stripMargin
  }

  /** Wide-width audio sig fragment: media universe (parents + "~a"
    * variants at a GENTLER perturbation — `:pt:` byte < 8 vs q84's
    * 24, because at 120 bits and the hamming ≤ 5 pigeonhole bound a
    * 9.4%-per-window perturbation would push every variant beyond
    * the cut and the gate would pair nothing) → md5-derived RMS
    * envelope (121 windows) → [[MediaDedup.audioEnvelopeSigWide]]'s
    * 6 × 20-bit band words. Emits `<p>media`, `<p>env`, `<p>steps`,
    * `<p>words`, `<p>sigs` (media_id, sig LIST), trailing comma. */
  private def audioSigCtesWide(p: String): String =
    s"""${p}media AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS media_id, CAST(NULL AS VARCHAR) AS parent
       |  FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id AS VARCHAR) || '~a', CAST(doc_id AS VARCHAR)
       |  FROM documents
       |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
       |    1, 2)) AS INTEGER) < 48),
       |${p}env AS (
       |  SELECT media_id, k AS frameIdx,
       |    (CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':env:' ||
       |       CAST(k AS VARCHAR)), 1, 2)) AS INTEGER)
       |     + CASE WHEN parent IS NOT NULL AND
       |         CAST(('0x' || substring(md5(media_id || ':pt:' ||
       |           CAST(k AS VARCHAR)), 1, 2)) AS INTEGER) < 8
       |       THEN 32 ELSE 0 END) / 256.0 AS rms
       |  FROM ${p}media, generate_series(0, 120) AS g(k)),
       |${p}steps AS (
       |  SELECT media_id, frameIdx, rms,
       |    lead(rms) OVER (PARTITION BY media_id ORDER BY frameIdx) AS nxt
       |  FROM ${p}env),
       |-- every media here has all 121 windows, so all 6 bands GROUP;
       |-- the Spark side's all-bands-always contract holds trivially
       |${p}words AS (
       |  SELECT media_id, frameIdx // 20 AS band,
       |    CAST(sum(CASE WHEN nxt > rms
       |      THEN CAST(1 AS BIGINT) << (frameIdx % 20)
       |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS word
       |  FROM ${p}steps WHERE frameIdx < 120 AND nxt IS NOT NULL
       |  GROUP BY 1, 2),
       |${p}sigs AS MATERIALIZED (
       |  SELECT media_id, list(word ORDER BY band) AS sig
       |  FROM ${p}words GROUP BY media_id),
       |""".stripMargin

  /** The wide pigeonhole pairing over a `<p>sigs` band-word LIST
    * relation ([[pairCtes]] at [[MediaDedup.Sig120]]'s 6 × 20-bit
    * banding): band b = sig[b], bucket cull at 10 000, distinct
    * candidate pairs, per-word popcount-sum verify at hamming ≤ 5.
    * Emits `<p>banded`, `<p>sized`, `<p>pairs`, trailing comma. */
  private def pairCtesWide(p: String): String =
    s"""${p}banded AS (
       |  SELECT media_id, b - 1 AS band, sig[b] AS bv
       |  FROM ${p}sigs, generate_series(1, 6) AS g(b)),
       |${p}sized AS (
       |  SELECT media_id, band, bv FROM ${p}banded
       |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
       |${p}pairs AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(list_sum([bit_count(xor(a.sig[i], b.sig[i]))
       |      for i in generate_series(1, 6)]) AS INTEGER) AS hamming
       |  FROM (
       |    SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
       |    FROM ${p}sized x JOIN ${p}sized y
       |      ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id) c
       |  JOIN ${p}sigs a ON a.media_id = c.a_id
       |  JOIN ${p}sigs b ON b.media_id = c.b_id
       |  WHERE list_sum([bit_count(xor(a.sig[i], b.sig[i]))
       |    for i in generate_series(1, 6)]) <= 5),
       |""".stripMargin

  /** q100: audio-envelope near-dup at the WIDE signature width
    * (round 12 — the q89→q96 width discipline carried to the AUDIO
    * modality, whose 60-bit family saturates its band space at the
    * same ~2M signatures): 121-window md5-derived envelopes →
    * [[MediaDedup.audioEnvelopeSigWide]] ([[MediaDedup.Sig120]]:
    * 120 gradient bits as 6 × 20-bit band words) →
    * [[MediaDedup.hammingPairsWide]] at the pigeonhole bound
    * (hamming ≤ 5). Variants are perturbed at a 3%-per-window rate
    * (q84 uses 9.4% — see [[audioSigCtesWide]]) so the planted pairs
    * mostly land within the wider cut with a handful honestly
    * beyond, the q83 shape. The oracle re-derives every envelope
    * byte, gradient bit, band word, bucket cull, candidate join and
    * popcount sum. The composed wide pipeline
    * ([[MediaDedup.crossModalDupGroupsWide]] — image + audio wide
    * sets through the shared `dupGroupsTail`) is spec-pinned
    * (MediaDedupSpec: Sig60 word-ized parity with the legacy q88
    * operator, plus a planted wide fixture), with this gate pinning
    * the audio-wide arithmetic value-for-value.
    */
  private def q100(s: SparkSession, dir: String): DataFrame =
    MediaDedup.hammingPairsWide(
        MediaDedup.audioEnvelopeSigWide(
          syntheticEnvelope(s, dir, windows = 121, perturbBar = 8)))
      .orderBy(col("a_id"), col("b_id"))

  private val q100Sql =
    s"""WITH ${audioSigCtesWide("")}${pairCtesWide("")}
       |fin AS (SELECT a_id, b_id, hamming FROM pairs)
       |SELECT a_id, b_id, hamming FROM fin
       |ORDER BY a_id, b_id""".stripMargin

  /** q101: the COMPOSED multimodal pipeline at the WIDE signature
    * width — the q88 statement past the 60-bit band-space ceiling
    * ([[MediaDedup.crossModalDupGroupsWide]] under ONE oracle):
    * wide image dHash (64×32 single frames, "~v" variants — the q99
    * corpus) + wide audio envelope signatures (121 windows, "~a"
    * variants — the q100 corpus) over the same underlying documents
    * → per-modality wide banded near-dup ([[pairCtesWide]]) → union
    * edge set → transitive closure → min-media_id survivor → catalog
    * join. A parent, its "~v" image variant and its "~a" audio
    * variant collapse into ONE group exactly as in q88 — the
    * cross-modal composition, now at the width a >2M-frame corpus
    * needs. Every fragment is shared: the image front with q99, the
    * audio front with q100, the closure/election tail with q88.
    */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).documents
      .select(col("doc_id").cast("string")).as[String]
    val imageSigs = MediaDedup.imageDHashWide(
        MediaDedup.syntheticFrameCorpusWide(ids))
      .select(col("media_id"), col("sig"))
    val audioSigs = MediaDedup.audioEnvelopeSigWide(
      syntheticEnvelope(s, dir, windows = 121, perturbBar = 8))
    MediaDedup.crossModalDupGroupsWide(Seq(imageSigs, audioSigs))
      .withColumn("parent_doc",
        substring_index(col("media_id"), "~", 1).cast("long"))
      .join(Tables(s, dir).documents
        .select(col("doc_id").as("parent_doc"), col("lang"), col("source")),
        Seq("parent_doc"))
      .select(col("media_id"), col("parent_doc"), col("lang"),
        col("source"), col("group_id"), col("group_size"), col("keep"))
      .orderBy(col("media_id"))
  }

  private val q101Sql =
    s"""WITH RECURSIVE ${imageSigCtesWide("wim_")}${pairCtesWide("wim_")}${audioSigCtesWide("wau_")}${pairCtesWide("wau_")}
       |edges AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT a_id AS a, b_id AS b FROM wim_pairs
       |    UNION ALL SELECT b_id, a_id FROM wim_pairs
       |    UNION ALL SELECT a_id, b_id FROM wau_pairs
       |    UNION ALL SELECT b_id, a_id FROM wau_pairs)),
       |walk(node, label) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node),
       |comp AS (SELECT node, min(label) AS component FROM walk GROUP BY node),
       |-- DISTINCT explicit: the q88 DuckDB recursive-sibling lesson
       |universe AS (
       |  SELECT DISTINCT media_id FROM (
       |    SELECT media_id FROM wim_sigs
       |    UNION ALL SELECT media_id FROM wau_sigs)),
       |assigned AS (
       |  SELECT u.media_id,
       |    coalesce(c.component, u.media_id) AS group_id
       |  FROM universe u LEFT JOIN comp c ON c.node = u.media_id),
       |gsz AS (SELECT group_id, count(*) AS group_size
       |  FROM assigned GROUP BY 1)
       |SELECT a.media_id,
       |  CAST(split_part(a.media_id, '~', 1) AS BIGINT) AS parent_doc,
       |  d.lang, d.source, a.group_id, z.group_size,
       |  a.media_id = a.group_id AS keep
       |FROM assigned a
       |JOIN gsz z USING (group_id)
       |JOIN documents d ON d.doc_id = CAST(split_part(a.media_id, '~', 1) AS BIGINT)
       |ORDER BY a.media_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q83_image_near_dup", q83, Some(q83Sql)),
    Q("q84_audio_near_dup", q84, Some(q84Sql)),
    Q("q88_media_pipeline", q88, Some(q88Sql)),
    Q("q89_video_containment", q89, Some(q89Sql)),
    Q("q103_video_containment_auto", q103, Some(q89Sql)),
    Q("q94_media_admission_oracle", q94, Some(q94Sql)),
    Q("q96_video_containment_wide", q96, Some(q96Sql)),
    Q("q99_media_admission_wide", q99, Some(q99Sql)),
    Q("q100_audio_near_dup_wide", q100, Some(q100Sql)),
    Q("q101_media_pipeline_wide", q101, Some(q101Sql)))
}
