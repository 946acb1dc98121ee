package graft.queries

import graft.Tables
import graft.operators.SimilaritySearch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity over the embeddings table: exact brute-force
  * cosine top-k (the baseline), LSH-bucketed approximate variant (the
  * scale path), centroids, and k-NN classification. Exact variants
  * carry DuckDB oracles (scores computed in DOUBLE and rounded to 4
  * decimals on both engines); the LSH variant is rows-only and is
  * validated against the exact baseline in scalatest (recall bound).
  */
object SimilarityQueries {

  // Anchors are the 20 smallest vec_ids — a FIXED-size deterministic
  // sample (ids are dense from 0): the broadcast side of the exact
  // baseline stays 20 rows at every SF, keeping the brute-force scan
  // O(k·N). (Round 1's vec_id % 25 grew the anchor set — and the
  // BroadcastNestedLoopJoin work — quadratically with the corpus.)
  private def anchors(df: DataFrame): DataFrame =
    df.filter(col("vec_id") < 20)

  private def q20(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    SimilaritySearch.cosineTopK(emb, anchors(emb), k = 10)
      .orderBy(col("anchor_id"), col("rank"))
  }

  private val q20Sql =
    """SELECT anchor_id, rank, neighbor_id, score FROM (
      |  SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS score,
      |    row_number() OVER (PARTITION BY a.vec_id
      |      ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rank
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id)
      |WHERE rank <= 10 ORDER BY anchor_id, rank""".stripMargin

  private def q21(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(sum(col("v").cast("double").cast("decimal(28,9)")).cast("double")
        / count(lit(1)), 6).as("centroid_v"))
      .orderBy(col("label"), col("pos"))

  private val q21Sql =
    """SELECT label, pos, round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS centroid_v
      |FROM (SELECT label, unnest(embedding) AS v,
      |        generate_subscripts(embedding, 1) - 1 AS pos
      |      FROM embeddings)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  private def q22(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    SimilaritySearch.knnClassify(emb, anchors(emb), k = 10)
      .orderBy(col("anchor_id"))
  }

  private val q22Sql =
    """WITH topk AS (
      |  SELECT anchor_id, neighbor_id FROM (
      |    SELECT a.vec_id AS anchor_id, b.vec_id AS neighbor_id,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rank
      |    FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id)
      |  WHERE rank <= 10)
      |SELECT anchor_id, n_label AS predicted_label, votes FROM (
      |  SELECT t.anchor_id, e.label AS n_label, count(*) AS votes,
      |    row_number() OVER (PARTITION BY t.anchor_id
      |      ORDER BY count(*) DESC, e.label) AS rn
      |  FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
      |  GROUP BY t.anchor_id, e.label)
      |WHERE rn = 1 ORDER BY anchor_id""".stripMargin

  private def q23(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir).embeddings
    SimilaritySearch.lshCosineTopK(emb, col("id") < 20, k = 10,
        numPlanes = 8, numTables = 4)
      .orderBy(col("anchor_id"), col("rank"))
  }

  val all: Seq[Q] = Seq(
    Q("q20_cosine_topk", q20, Some(q20Sql), headline = true),
    Q("q21_label_centroids", q21, Some(q21Sql)),
    Q("q22_knn_classify", q22, Some(q22Sql)),
    Q("q23_lsh_cosine_topk", q23, None, headline = true))
}
