package graft

import graft.operators.TextRank
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark hash join"),
    (2L, "vector search index"),
    (3L, "the quick brown fox"),
    (4L, "spark hash hash hash table table")).toDF("doc_id", "text")

  test("tfidf: hand-computed weight for a known (doc, term)") {
    val rows = TextRank.tfidf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // "spark": df=2 of N=4 → idf = round(ln(5/3)+1, 6) = 1.510826
    val (tf, df, w) = rows((1L, "spark"))
    assert(tf === 2L && df === 2L)
    assert(w === math.rint(2 * 1.510826 * 1e6) / 1e6)
    // corpus-universal-ish term stays positive (smoothed idf)
    assert(rows((3L, "the"))._3 > 0.0)
  }

  test("bm25: matching docs only, more hits rank higher, tf saturates") {
    val got = TextRank.bm25(docs, "doc_id", "text", Seq("spark", "hash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 4L)) // docs 2,3 match nothing
    assert(got(1L)._1 === 2L && got(4L)._1 === 2L)
    assert(got(1L)._2 > 0 && got(4L)._2 > 0)
    // doc 4 has tf(hash)=3 vs doc 1's 1, but is longer; both scores
    // bounded by Σ idf·(k1+1) — the saturation ceiling
    val ceil = 2.0 * 2.2 * math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    assert(got(1L)._2 < ceil && got(4L)._2 < ceil)
  }

  test("bm25 plan: no window, no cartesian; corpus stats broadcast") {
    val plan = TextRank.bm25(docs, "doc_id", "text", Seq("spark"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"))
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin")) // the scalar stats attach
  }
}
