package graft.domain

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy/assignment joins (SURVEY J7-J10, X8, A12).
  *
  * The group-wise operators run in `groupByKey.cogroup` /
  * `flatMapGroups` — the idiomatic Spark escape hatch for per-group
  * procedural logic. Groups are album-sized (≤ a few hundred rows;
  * the reference's matrices are ≤ ~50×50 — song_info_matcher.py:174),
  * so the per-group work is trivially bounded and the operator scales
  * with the number of groups, never the corpus. The combinatorial
  * explosion warning in SURVEY §7(d) is structural here: matching is
  * only expressible within a pre-joined group key.
  */
object FuzzyMatch {

  /** X8: NFKC-compatibility-fold → NFD → letters only → lowercase
    * (song_info_matcher.py:100-107). Handles fullwidth forms
    * ("ＴＥＳＴ" → "test") AND strips diacritics: the NFD pass
    * decomposes 'é' into 'e' + a combining mark, and the
    * letter-category filter drops the mark ("Café" → "cafe") —
    * exactly the reference's category-L filter on the NFD string. */
  val normalizeLettersOnly: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => norm(s) }

  /** Plain-Scala Levenshtein (for group-side scoring). */
  private[graft] def levenshteinDistance(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      prev = cur.clone()
      i += 1
    }
    prev(b.length)
  }

  /** Similarity ratio in [0,100]: 100·(1 − lev/maxLen) — the engine's
    * fuzz.ratio equivalent (identical strings → 100, disjoint → ~0). */
  private[graft] def ratioScala(a: String, b: String): Double = {
    val m = math.max(a.length, b.length)
    if (m == 0) 100.0 else 100.0 * (1.0 - levenshteinDistance(a, b).toDouble / m)
  }

  /** Column form of [[ratioScala]] using the codegen'd builtin. */
  def similarityRatio(a: Column, b: Column): Column = {
    val m = greatest(length(a), length(b))
    when(m === 0, 100.0)
      .otherwise(lit(100.0) * (lit(1.0) -
        levenshtein(a, b).cast("double") / m.cast("double")))
  }

  /** J8: token_set_ratio equivalent — similarity of the sorted
    * distinct-token joins (order/duplication insensitive). */
  def tokenSetRatio(a: Column, b: Column): Column = {
    val norm = (c: Column) => array_join(array_sort(array_distinct(
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0))), " ")
    similarityRatio(norm(a), norm(b))
  }

  /** Hungarian algorithm (Kuhn-Munkres with potentials, O(n²m)) —
    * minimizing; rows ≤ cols required. Returns col index per row. */
  private[graft] def hungarianMin(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    if (n == 0) return Array.empty
    val m = cost(0).length
    require(n <= m, "rows must be <= cols (pad the matrix)")
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1) // row matched to col (1-based; 0 = free)
    val way = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = new Array[Boolean](m + 1)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        if (p(j0) == 0) done = true
      }
      // augment along the alternating path
      while (j0 != 0) {
        val j1 = way(j0)
        p(j0) = p(j1)
        j0 = j1
      }
      i += 1
    }
    val ans = new Array[Int](n)
    var j = 1
    while (j <= m) {
      if (p(j) > 0) ans(p(j) - 1) = j - 1
      j += 1
    }
    ans
  }

  case class TitleRow(key: String, id: String, title: String)
  case class AssignedPair(key: String, left_id: String, right_id: String,
      score: Double, group_accepted: Boolean)

  /** J7: assignment-problem join — per group key (album pair), match
    * left titles to right titles maximizing total normalized
    * similarity (Hungarian), accepting the group iff
    * Σscore ≥ acceptFrac · (distinct normalized titles × 100)
    * (song_info_matcher.py:123-171,256-298). */
  def assignmentJoin(spark: SparkSession, left: Dataset[TitleRow],
      right: Dataset[TitleRow],
      acceptFrac: Double = 0.8): Dataset[AssignedPair] = {
    import spark.implicits._
    left.groupByKey(_.key).cogroup(right.groupByKey(_.key)) {
      (key, ls, rs) =>
        val l = ls.toArray
        val r = rs.toArray
        if (l.isEmpty || r.isEmpty) Iterator.empty
        else {
          val ln = l.map(t => norm(t.title))
          val rn = r.map(t => norm(t.title))
          val flip = ln.length > rn.length
          val (rows, cols, rowIds, colIds) =
            if (flip) (rn, ln, r.map(_.id), l.map(_.id))
            else (ln, rn, l.map(_.id), r.map(_.id))
          // maximize similarity == minimize (100 - ratio)
          val cost = rows.map(a => cols.map(b => 100.0 - ratioScala(a, b)))
          val assign = hungarianMin(cost)
          val pairs = rows.indices.map { ri =>
            val ci = assign(ri)
            (rowIds(ri), colIds(ci), ratioScala(rows(ri), cols(ci)))
          }
          val total = pairs.map(_._3).sum
          // acceptance denominator: distinct normalized titles of the
          // SRC (left) side, regardless of which side the Hungarian
          // matrix was flipped to — the reference's total_potential is
          // always unique_normalized_src_titles
          // (song_info_matcher.py:134-148)
          val accepted = total >= acceptFrac * (ln.distinct.length * 100.0)
          pairs.iterator.map { case (a, b, s) =>
            if (flip) AssignedPair(key, b, a, s, accepted)
            else AssignedPair(key, a, b, s, accepted)
          }
        }
    }
  }

  private[graft] def norm(s: String): String =
    if (s == null) ""
    else java.text.Normalizer.normalize(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC),
        java.text.Normalizer.Form.NFD)
      .filter(_.isLetter).toLowerCase

  case class PathRow(key: String, kind: String, path: String)
  case class PrefixPair(key: String, cue_path: String, audio_path: String,
      prefix_len: Int)

  /** J9: greedy longest-common-prefix bipartite pairing of cue files
    * to audio files within a group (Shared/utils.py:159-189 —
    * max_common_prefix). GREEDY PER CUE in order, not a global
    * longest-first matching: each cue (sorted — the reference used
    * the caller's array order; sorting makes the distributed group
    * iterator deterministic) takes its best still-available audio.
    * Reference parity details: a cue with NO common prefix to any
    * remaining audio stays unpaired and consumes nothing
    * (max_common_prefix only pairs when max_prefix is non-empty),
    * and prefix-length ties keep the FIRST candidate in order
    * (strictly-greater comparison). */
  def prefixPairs(spark: SparkSession,
      files: Dataset[PathRow]): Dataset[PrefixPair] = {
    import spark.implicits._
    files.groupByKey(_.key).flatMapGroups { (key, it) =>
      val rows = it.toArray
      val cues = rows.filter(_.kind == "cue").map(_.path)
      val audios = scala.collection.mutable.ArrayBuffer(
        rows.filter(_.kind == "audio").map(_.path).sorted: _*)
      def common(a: String, b: String): Int =
        a.zip(b).takeWhile { case (x, y) => x == y }.length
      cues.sorted.flatMap { cue =>
        if (audios.isEmpty) None
        else {
          val best = audios.minBy(a => (-common(cue, a), a))
          val len = common(cue, best)
          if (len == 0) None
          else {
            audios -= best
            Some(PrefixPair(key, cue, best, len))
          }
        }
      }.iterator
    }
  }

  case class DirDurations(key: String, dir: String, durations: Seq[Double])
  case class MirrorPair(key: String, dir_a: String, dir_b: String,
      matched_frac: Double)

  /** J10: duration-multiset mirror detection — two directories of one
    * album whose track durations pair within ±8 s for ≥85% of tracks
    * are format mirrors; the pair is emitted for dedup
    * (disc_duration_guard.py:92-144). */
  def mirrorDirs(spark: SparkSession, dirs: Dataset[DirDurations],
      tolSec: Double = 8.0, minFrac: Double = 0.85): Dataset[MirrorPair] = {
    import spark.implicits._
    dirs.groupByKey(_.key).flatMapGroups { (key, it) =>
      val ds = it.toArray.sortBy(_.dir)
      for {
        i <- ds.indices.iterator
        j <- (i + 1 until ds.length).iterator
        frac = matchedFrac(ds(i).durations, ds(j).durations, tolSec)
        if frac >= minFrac
      } yield MirrorPair(key, ds(i).dir, ds(j).dir, frac)
    }
  }

  /** Greedy tolerance-band multiset match fraction. */
  private def matchedFrac(a: Seq[Double], b: Seq[Double],
      tol: Double): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val bs = scala.collection.mutable.ArrayBuffer(b.sorted: _*)
    var matched = 0
    for (x <- a.sorted) {
      val idx = bs.indexWhere(y => math.abs(x - y) <= tol)
      if (idx >= 0) { matched += 1; bs.remove(idx) }
    }
    matched.toDouble / math.max(a.length, b.length)
  }
}
