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
  */
object MediaQueries {

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
    """WITH media AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS media_id, NULL AS parent
      |  FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) || '~v', CAST(doc_id AS VARCHAR)
      |  FROM documents
      |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
      |    1, 2)) AS INTEGER) < 48),
      |px AS (
      |  SELECT media_id,
      |    [least(255,
      |       CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':px:' ||
      |         CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER)
      |       + CASE WHEN parent IS NOT NULL AND
      |           CAST(('0x' || substring(md5(media_id || ':pt:' ||
      |             CAST((i-1)//16 AS VARCHAR)), 1 + 2*((i-1)%16), 2)) AS INTEGER) < 3
      |         THEN 80 ELSE 0 END)
      |     for i in generate_series(1, 1056)] AS p
      |  FROM media),
      |tiles AS (
      |  SELECT media_id,
      |    [list_sum(flatten([[p[(((t-1)//11)*4 + dy)*44 + ((t-1)%11)*4 + dx + 1]
      |        for dx in generate_series(0,3)] for dy in generate_series(0,3)])) // 16
      |     for t in generate_series(1, 66)] AS avgs
      |  FROM px),
      |sigs AS (
      |  SELECT media_id,
      |    CAST(list_sum([CASE WHEN avgs[((k-1)//10)*11 + (k-1)%10 + 2] >
      |                        avgs[((k-1)//10)*11 + (k-1)%10 + 1]
      |      THEN CAST(1 AS BIGINT) << (k-1) ELSE CAST(0 AS BIGINT) END
      |      for k in generate_series(1, 60)]) AS BIGINT) AS sig
      |  FROM tiles),
      |banded AS (
      |  SELECT media_id, b AS band, (sig >> (b*15)) & 32767 AS bv
      |  FROM sigs, generate_series(0,3) AS g(b)),
      |sized AS (
      |  SELECT media_id, band, bv FROM banded
      |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
      |cands AS (
      |  SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
      |  FROM sized x JOIN sized y
      |    ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id)
      |SELECT c.a_id, c.b_id,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
      |FROM cands c
      |JOIN sigs a ON a.media_id = c.a_id
      |JOIN sigs b ON b.media_id = c.b_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY a_id, b_id""".stripMargin

  /** q84: audio-envelope near-dup — the RELATIONAL half of the audio
    * family ([[MediaDedup.audioEnvelopeSig]] → 60-bit gradient sig →
    * the same 4×15 pigeonhole pairing) under a FULL oracle: envelopes
    * derive from md5 bytes of doc_id (61 windows, ~19% of ids get a
    * loudness-perturbed "~a" variant), integer-valued rms/256 doubles
    * so every comparison is exact in both engines. The CODEC half
    * (WAV PCM decode → RMS) is spec-verified where DuckDB cannot
    * follow (MediaDedupSpec's gained+shifted WAV re-encode).
    */
  private def q84(s: SparkSession, dir: String): DataFrame = {
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
    val env = parents.unionByName(variants)
      .select(col("media_id"), col("parent"),
        explode(sequence(lit(0), lit(60))).as("frameIdx"))
      .withColumn("rms",
        (hexByte(concat(coalesce(col("parent"), col("media_id")),
          lit(":env:"), col("frameIdx").cast("string")))
          + when(col("parent").isNotNull &&
              hexByte(concat(col("media_id"), lit(":pt:"),
                col("frameIdx").cast("string"))) < 24, 32)
            .otherwise(0)) / lit(256.0))
      .select(col("media_id"), col("frameIdx"), col("rms"))
    MediaDedup.hammingPairs(MediaDedup.audioEnvelopeSig(env),
        maxHamming = 3)
      .orderBy(col("a_id"), col("b_id"))
  }

  private val q84Sql =
    """WITH media AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS media_id, NULL AS parent
      |  FROM documents
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) || '~a', CAST(doc_id AS VARCHAR)
      |  FROM documents
      |  WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':var'),
      |    1, 2)) AS INTEGER) < 48),
      |env AS (
      |  SELECT media_id, k AS frameIdx,
      |    (CAST(('0x' || substring(md5(coalesce(parent, media_id) || ':env:' ||
      |       CAST(k AS VARCHAR)), 1, 2)) AS INTEGER)
      |     + CASE WHEN parent IS NOT NULL AND
      |         CAST(('0x' || substring(md5(media_id || ':pt:' ||
      |           CAST(k AS VARCHAR)), 1, 2)) AS INTEGER) < 24
      |       THEN 32 ELSE 0 END) / 256.0 AS rms
      |  FROM media, generate_series(0, 60) AS g(k)),
      |steps AS (
      |  SELECT media_id, frameIdx, rms,
      |    lead(rms) OVER (PARTITION BY media_id ORDER BY frameIdx) AS nxt
      |  FROM env),
      |sigs AS (
      |  SELECT media_id, CAST(sum(CASE WHEN nxt > rms
      |    THEN CAST(1 AS BIGINT) << frameIdx ELSE CAST(0 AS BIGINT) END)
      |    AS BIGINT) AS sig
      |  FROM steps WHERE frameIdx < 60 AND nxt IS NOT NULL
      |  GROUP BY media_id),
      |banded AS (
      |  SELECT media_id, b AS band, (sig >> (b*15)) & 32767 AS bv
      |  FROM sigs, generate_series(0,3) AS g(b)),
      |sized AS (
      |  SELECT media_id, band, bv FROM banded
      |  QUALIFY count(*) OVER (PARTITION BY band, bv) <= 10000),
      |cands AS (
      |  SELECT DISTINCT x.media_id AS a_id, y.media_id AS b_id
      |  FROM sized x JOIN sized y
      |    ON x.band = y.band AND x.bv = y.bv AND x.media_id < y.media_id)
      |SELECT c.a_id, c.b_id,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
      |FROM cands c
      |JOIN sigs a ON a.media_id = c.a_id
      |JOIN sigs b ON b.media_id = c.b_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY a_id, b_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q83_image_near_dup", q83, Some(q83Sql)),
    Q("q84_audio_near_dup", q84, Some(q84Sql)))
}
