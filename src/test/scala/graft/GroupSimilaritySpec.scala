package graft

import graft.operators.GroupSimilarity
import org.apache.spark.sql.functions._
import scala.math.BigDecimal.RoundingMode

/** Dual-implementation validation of the A11 group scores (the
  * reference's own pattern, and its check_symmetry self-test:
  * precompute_similar_groups.py:238-257 — symmetry err and raw/kde
  * self-score ≈ 1).
  */
class GroupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val gamma = 8.0
  private val dupThresh = 0.9985

  // 3 groups, dim 4. A and B share one near-identical member (the
  // "same recording" case); C is unrelated noise.
  private def vecs(seed: Int, n: Int): Seq[Array[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(4)(r.nextDouble() * 2 - 1))
  }
  private lazy val groupA = vecs(1, 4)
  private lazy val groupB = {
    val dup = groupA.head.clone(); dup(0) += 1e-4
    dup +: vecs(2, 3)
  }
  private lazy val groupC = vecs(3, 4)
  private lazy val members =
    (groupA.zipWithIndex.map { case (v, i) => ("A", i.toLong, v) } ++
      groupB.zipWithIndex.map { case (v, i) => ("B", i.toLong, v) } ++
      groupC.zipWithIndex.map { case (v, i) => ("C", i.toLong, v) })
      .toDF("grp", "mid", "vec")

  // ---- plain-Scala reference implementation (same rounding contract) --
  private def r4(x: Double) = BigDecimal(x).setScale(4, RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) = BigDecimal(x).setScale(6, RoundingMode.HALF_UP).toDouble
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
  private def kern(c: Double) = r6(math.exp(gamma * (c - 1.0)))
  private def selfMass(g: Seq[Array[Double]]): Double = {
    val s = (for (x <- g; y <- g) yield BigDecimal(kern(r4(cos(x, y))))).sum
    (s / (g.length.toLong * g.length)).toDouble
  }
  private def refScores(a: Seq[Array[Double]], b: Seq[Array[Double]])
      : (Double, Double, Double) = {
    val cs = a.map(x => b.map(y => r4(cos(x, y))))
    val ksum = cs.flatten.map(c => BigDecimal(kern(c))).sum.toDouble
    val kde = (ksum / (a.length * b.length)) / math.sqrt(selfMass(a) * selfMass(b))
    def chamfer(rows: Seq[Seq[Double]], style: Boolean): Double = {
      val bests = rows.map { r =>
        val cands = if (style) r.filter(_ < dupThresh) else r
        BigDecimal(if (cands.isEmpty) 0.0 else cands.max)
      }
      (bests.sum / rows.length).toDouble
    }
    val raw = 0.5 * (chamfer(cs, style = false) + chamfer(cs.transpose, style = false))
    val sty = 0.5 * (chamfer(cs, style = true) + chamfer(cs.transpose, style = true))
    (r6(sty), r6(raw), r6(kde))
  }
  // ---------------------------------------------------------------------

  private lazy val capped =
    GroupSimilarity.cappedMembers(members, "grp", "mid", "vec", pad = 64)
  private def pairDf(ps: (String, String)*) = ps.toDF("a_gid", "b_gid")

  test("scores match the plain-Scala reference on every pair") {
    val got = GroupSimilarity.scores(capped,
        pairDf(("A", "B"), ("A", "C"), ("B", "C")), gamma, dupThresh)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val fixtures = Map("A" -> groupA, "B" -> groupB, "C" -> groupC)
    for (((x, y), (s, r, k)) <- got) {
      val (es, er, ek) = refScores(fixtures(x), fixtures(y))
      assert(math.abs(s - es) < 1e-9, s"style $x-$y: $s vs $es")
      assert(math.abs(r - er) < 1e-9, s"raw $x-$y: $r vs $er")
      assert(math.abs(k - ek) < 1e-9, s"kde $x-$y: $k vs $ek")
    }
  }

  test("symmetry and self-score ≈ 1 (the reference's check_symmetry)") {
    val ab = GroupSimilarity.scores(capped, pairDf(("A", "B")), gamma).collect()(0)
    val ba = GroupSimilarity.scores(capped, pairDf(("B", "A")), gamma).collect()(0)
    for (i <- 2 to 4)
      assert(math.abs(ab.getDouble(i) - ba.getDouble(i)) < 1e-9)
    val self = GroupSimilarity.scores(capped, pairDf(("A", "A")), gamma,
      dupThresh).collect()(0)
    assert(math.abs(self.getDouble(3) - 1.0) < 1e-3) // raw self ≈ 1
    assert(math.abs(self.getDouble(4) - 1.0) < 1e-3) // kde self ≈ 1
  }

  test("style demotes a pure re-release; kde dilutes rather than maxes") {
    // D = exact copy of A: raw ≈ 1, but every member pair ≥ dupThresh
    // in its best slot → style collapses toward 0 (py:16-27)
    val withDup = members.union(
      groupA.zipWithIndex.map { case (v, i) => ("D", i.toLong, v) }
        .toDF("grp", "mid", "vec"))
    val capped2 = GroupSimilarity.cappedMembers(withDup, "grp", "mid", "vec")
    val got = GroupSimilarity.scores(capped2, pairDf(("A", "D"), ("A", "B")),
        gamma, dupThresh)
      .collect().map(r => (r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (styD, rawD, kdeD) = got("D")
    assert(rawD > 0.999)              // shares every recording
    assert(styD < got("B")._1 + 1e-9 || styD < 0.9) // re-release demoted
    assert(kdeD > got("B")._3)        // mass sits in the same place
  }

  test("calibrateGamma is the median heuristic over sampled pairs") {
    val pairs = pairDf(("A", "B"), ("A", "C"))
    val got = GroupSimilarity.calibrateGamma(capped, pairs)
    val dists = (for (x <- groupA; y <- groupB) yield 1.0 - cos(x, y)) ++
      (for (x <- groupA; y <- groupC) yield 1.0 - cos(x, y))
    val sorted = dists.sorted
    val med = // percentile(0.5): linear interpolation between ranks
      if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    assert(math.abs(got - 1.0 / math.max(med, 1e-4)) < 1e-6)
  }

  test("similarGroups end-to-end: recall + rank by kde") {
    val got = GroupSimilarity.similarGroups(members, "grp", "mid", "vec",
      anchorPred = col("gid") === "A", recallK = 2, gamma = Some(gamma))
    val rows = got.orderBy("rank").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).distinct.toSeq === Seq("A"))
    assert(rows(0).getAs[Int]("rank") === 1)
    // B (shares a recording) outranks C (noise) on kde
    assert(rows(0).getString(1) === "B")
  }
}
