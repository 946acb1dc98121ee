package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RhpExpressions

/** ENGINE-PORTABLE IVF-PQ (IVFADC) — the oracle twin of the q73
  * deployment path (`SimilaritySearch.ivfPqTopKScore`), end-to-end:
  * coarse-quantizer TRAINING, residual computation, per-subspace
  * codebook TRAINING, PQ encoding, nprobe candidate routing, ADC
  * approximation, shortlist rerank and the exact final top-k — every
  * stage under committed deterministic arithmetic so the ENTIRE
  * pipeline re-derives value-for-value in SQL (zero fixtures, the q80
  * discipline). Reference anchor: the IVF index build + ANN query of
  * `Experimental/vector_search/precompute_similar_tracks.py:116-150`,
  * whose float k-means/FAISS internals can only ever gate rows-only;
  * this twin is the same algorithm under portable arithmetic.
  *
  * Portability choices, each the established one:
  *   - both trainers are [[KMeansPortable]] Lloyd loops (first-k-ids
  *     init, exact-decimal argmin, DECIMAL(38,12) means, fixed
  *     iteration count) — coarse on raw vectors, codebooks on the
  *     classical IVFADC residuals v − c(v) (Jégou et al. §IV; the
  *     residual subtraction is one exact IEEE double op per
  *     dimension, identical in any engine);
  *   - PQ encoding IS the Lloyd assignment rule per subspace —
  *     [[KMeansPortable.cellExpr]] on the residual slice, so the
  *     encode arithmetic is single-sited with every other oracle
  *     that assigns cells;
  *   - ADC scores via RECONSTRUCTION: approx(a, v) = decimalDot(a,
  *     c_cell + concat_j cb_j[code_j]). Algebraically this is the
  *     per-subspace lookup-table sum (the native q73 kernel) — but
  *     as ONE fused decimal dot there is a single rounding site
  *     instead of m float partial sums whose addition order an
  *     engine could permute. The native path keeps the table-lookup
  *     form for speed; the twin trades that for provable parity.
  *   - every ranking tie-breaks by id (probe cells by index,
  *     shortlist and top-k by neighbor id).
  *
  * Scale shape — identical to the native path: training state is
  * (nlist·dim + m·ksub·dsub) scalars on the driver (the Lloyd
  * discipline); assignment/encoding/reconstruction are one
  * zero-shuffle projection; candidate routing is an equi-join on the
  * cell id; only the nprobe/nlist fraction of the corpus is scored
  * per anchor and the rerank set is `rerank` ids per anchor.
  */
object IvfPqPortable {

  /** End-to-end portable IVF-PQ top-k: (anchor_id, rank, neighbor_id,
    * score), score = round(cosine, 6), rank 1..k per anchor.
    * `anchorPred` is evaluated against the renamed `id` column (the
    * [[SimilaritySearch]] convention). dim must be divisible by `m`.
    */
  def topK(vectors: DataFrame, anchorPred: Column, k: Int,
      nlist: Int, coarseIters: Int, m: Int, ksub: Int, subIters: Int,
      nprobe: Int, rerank: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // fail the (m, dim) contract BEFORE paying a full coarse training
    // job (review r9): one head row answers it in milliseconds
    val dimRow = vectors.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "topK: empty or all-null vector set")
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    // dim was probed from ONE row; a ragged corpus (mixed widths) or
    // null vectors would otherwise slice residuals silently wrong
    // downstream (ADVICE r9). Enforce uniformity per-row at zero
    // happy-path cost — the admitIncremental raise_error discipline —
    // so the first deviant row fails the job loudly instead.
    val checkedVec = when(col(vecCol).isNotNull &&
        size(col(vecCol)) === lit(dim), col(vecCol).cast("array<double>"))
      .otherwise(raise_error(concat(
        lit(s"IvfPqPortable.topK: non-uniform vector set — probed dim=$dim, "),
        lit("but id "), col(idCol).cast("string"), lit(" has "),
        when(col(vecCol).isNull, lit("NULL"))
          .otherwise(size(col(vecCol)).cast("string"))))
        .cast("array<double>"))
    val base = graft.CacheScope.track(Par.ensureWide(vectors)
      .select(col(idCol).cast("long").as("id"),
        checkedVec.as("vec"))
      .withColumn("n2",
        RhpExpressions.decimalScaledDot(col("vec"), col("vec"))))

    // ---- training (driver state: nlist·dim + m·ksub·dsub scalars).
    // Trains through the CHECKED base, not the raw input, so the
    // ragged-dim guard covers the FIRST job — otherwise coarse Lloyd
    // would run to completion on silently-truncated dots before the
    // guard fires (round-10 review); values are identical for a
    // uniform corpus (same cast, same id order, same seeds) and the
    // training now reads the cache the encode stage needs anyway
    val coarse = KMeansPortable.trainModel(
      base.select(col("id"), col("vec")), nlist, coarseIters,
      "id", "vec").centroids
    val centsLit = typedLit(coarse.map(_.toSeq).toSeq)
    // residuals once, shared by all m subspace trainings + encoding
    val withRes = graft.CacheScope.track(
      KMeansPortable.assignCells(base, coarse)
        .withColumn("rvec", zip_with(col("vec"),
          element_at(centsLit, col("cell") + 1), (x, c) => x - c)))
    val codebooks = (0 until m).map { j =>
      KMeansPortable.trainModel(
        withRes.select(col("id"),
          slice(col("rvec"), j * dsub + 1, dsub).as("svec")),
        ksub, subIters, "id", "svec").centroids
    }.toArray

    // ---- encode + reconstruct: ONE zero-shuffle projection — each
    // code is the Lloyd assignment of the residual slice, the
    // reconstruction re-adds the coarse centroid
    val codeCols = (0 until m).map { j =>
      val sl = slice(col("rvec"), j * dsub + 1, dsub)
      KMeansPortable.cellExpr(sl,
        RhpExpressions.decimalScaledDot(sl, sl), codebooks(j))
    }
    val cwCols = (0 until m).map { j =>
      element_at(typedLit(codebooks(j).map(_.toSeq).toSeq),
        codeCols(j) + 1)
    }
    val encoded = withRes.select(col("id").as("nid"), col("cell"),
      zip_with(element_at(centsLit, col("cell") + 1),
        concat(cwCols: _*), (c, w) => c + w).as("recon"))

    // ---- candidate routing: each anchor probes its nprobe nearest
    // cells under the SAME decimal distance + lowest-index tie rule
    // as the assignment (array_sort on (d, j) structs == the oracle's
    // ORDER BY dist, j window)
    val anchors = base.filter(anchorPred)
    val probeCells = anchors.select(col("id").as("anchor_id"),
        col("vec").as("a_vec"), col("n2").as("a_n2"),
        explode(slice(array_sort(array(
          KMeansPortable.distStructs(col("vec"), col("n2"), coarse): _*)),
          1, nprobe)).as("pc"))
      .select(col("anchor_id"), col("a_vec"), col("a_n2"),
        col("pc.j").as("cell"))

    // ---- ADC approximation + shortlist (top `rerank` per anchor by
    // approx DESC, neighbor id ASC — TopKByScore's tie rule)
    val approx = encoded.join(probeCells, "cell")
      .filter(col("anchor_id") =!= col("nid"))
      .select(col("anchor_id"), col("nid").as("neighbor_id"),
        RhpExpressions.decimalScaledDot(col("a_vec"), col("recon"))
          .as("score"))
    val shortlist = SimilaritySearch.rankTopK(approx, rerank)
      .select(col("anchor_id"), col("neighbor_id"))

    // ---- exact rerank: decimal cosine, the q74 scoring rule
    val scored = shortlist
      .join(base.select(col("id").as("anchor_id"), col("vec").as("a_vec"),
        col("n2").as("a_n2")), "anchor_id")
      .join(base.select(col("id").as("neighbor_id"), col("vec").as("n_vec"),
        col("n2").as("b_n2")), "neighbor_id")
      .withColumn("score", round(
        RhpExpressions.decimalScaledDot(col("a_vec"), col("n_vec")) /
          (sqrt(col("a_n2")) * sqrt(col("b_n2"))), 6))
      .select(col("anchor_id"), col("neighbor_id"), col("score"))
    SimilaritySearch.rankTopK(scored, k)
  }

  /** The DuckDB re-derivation of [[topK]] — composes one prefixed
    * [[KMeansPortable.lloydCtes]] chain for the coarse quantizer and
    * one per subspace (over the residual-slice relations), the shared
    * [[KMeansPortable.assignmentCtes]] for corpus assignment and PQ
    * encoding, then reconstruction, routing, ADC, rerank and top-k as
    * plain SQL over the same decimal arithmetic. `anchorPredSql` is a
    * predicate over `id`.
    */
  def oracleSql(table: String, idCol: String, vecCol: String, k: Int,
      nlist: Int, coarseIters: Int, m: Int, ksub: Int, subIters: Int,
      nprobe: Int, rerank: Int, dim: Int,
      anchorPredSql: String): String = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val cCd = s"c_cd$coarseIters"
    val sb = new StringBuilder("WITH ")
    sb ++= KMeansPortable.lloydCtes(table, idCol, vecCol, nlist,
      coarseIters, "c_")
    // corpus cell assignment against the trained coarse centroids
    sb ++= KMeansPortable.assignmentCtes("ca", cCd, "c_dims", "c_norms")
    sb ++=
      s"""rdims AS (
         |  SELECT m.id, m.d, m.x - cd.c AS x
         |  FROM c_dims m
         |  JOIN asca a ON a.id = m.id
         |  JOIN $cCd cd ON cd.j = a.cell AND cd.d = m.d),
         |""".stripMargin
    for (j <- 0 until m) {
      sb ++=
        s"""s${j}_src AS (
           |  SELECT id, list(x ORDER BY d) AS xs
           |  FROM rdims WHERE d >= ${j * dsub} AND d < ${(j + 1) * dsub}
           |  GROUP BY id),
           |""".stripMargin
      sb ++= KMeansPortable.lloydCtes(s"s${j}_src", "id", "xs", ksub,
        subIters, s"s${j}_")
      sb ++= KMeansPortable.assignmentCtes(s"e$j",
        s"s${j}_cd$subIters", s"s${j}_dims", s"s${j}_norms")
    }
    val cwUnion = (0 until m).map { j =>
      s"""  SELECT e.id, ${j * dsub} + cb.d AS d, cb.c AS cw
         |  FROM ase$j e JOIN s${j}_cd$subIters cb ON cb.j = e.cell""".stripMargin
    }.mkString("\n  UNION ALL\n")
    sb ++=
      s"""cwdims AS (
         |$cwUnion),
         |recdims AS (
         |  SELECT w.id, w.d, cd.c + w.cw AS x
         |  FROM cwdims w
         |  JOIN asca a ON a.id = w.id
         |  JOIN $cCd cd ON cd.j = a.cell AND cd.d = w.d),
         |aset AS (SELECT id FROM c_v WHERE $anchorPredSql),
         |probe AS (
         |  SELECT id AS anchor_id, j AS cell FROM (
         |    SELECT d.id, d.j, row_number() OVER (PARTITION BY d.id
         |      ORDER BY (n.n2 - 2.0 * d.dot + c.nc2), d.j) AS rn
         |    FROM dotca d
         |    JOIN c_norms n ON n.id = d.id
         |    JOIN cnca c ON c.j = d.j
         |    WHERE d.id IN (SELECT id FROM aset)) WHERE rn <= $nprobe),
         |cands AS (
         |  SELECT p.anchor_id, a.id AS nid
         |  FROM probe p JOIN asca a ON a.cell = p.cell
         |  WHERE a.id <> p.anchor_id),
         |approx AS (
         |  SELECT c.anchor_id, c.nid,
         |    CAST(sum(CAST(round(ad.x * r.x, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS ap
         |  FROM cands c
         |  JOIN c_dims ad ON ad.id = c.anchor_id
         |  JOIN recdims r ON r.id = c.nid AND r.d = ad.d
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT anchor_id, nid FROM (
         |    SELECT anchor_id, nid, row_number() OVER (
         |      PARTITION BY anchor_id ORDER BY ap DESC, nid) AS rn
         |    FROM approx) WHERE rn <= $rerank),
         |dote AS (
         |  SELECT s.anchor_id, s.nid,
         |    CAST(sum(CAST(round(da.x * db.x, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) AS dot
         |  FROM short s
         |  JOIN c_dims da ON da.id = s.anchor_id
         |  JOIN c_dims db ON db.id = s.nid AND db.d = da.d
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.anchor_id, d.nid AS neighbor_id,
         |    round(d.dot / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS score
         |  FROM dote d
         |  JOIN c_norms na ON na.id = d.anchor_id
         |  JOIN c_norms nb ON nb.id = d.nid)
         |SELECT anchor_id, rank, neighbor_id, score FROM (
         |  SELECT anchor_id, neighbor_id, score,
         |    CAST(row_number() OVER (PARTITION BY anchor_id
         |      ORDER BY score DESC, neighbor_id) AS INT) AS rank
         |  FROM scored)
         |WHERE rank <= $k ORDER BY anchor_id, rank""".stripMargin
    sb.toString
  }
}
