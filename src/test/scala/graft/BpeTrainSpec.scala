package graft

import graft.operators.BpeTrain

/** BPE merge learning (q63): the full merge table on the classic
  * Sennrich-style fixture is pinned against an INDEPENDENT Python BPE
  * implementation (word-frequency table, freq-desc / pair-asc
  * tie-break, greedy left-to-right merge — run offline, results
  * inlined), plus the exhaustion and tie-break edge cases.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("merge table matches the independent Python reference") {
    // 5×low 2×lower 6×newest 3×widest
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = BpeTrain.learnMerges(Seq((1L, text)).toDF("doc_id", "text"),
        "text", numMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L),
      (3, "lo", "w", 7L), (4, "e", "w", 6L), (5, "ew", "est", 6L),
      (6, "n", "ewest", 6L), (7, "d", "est", 3L)))
  }

  test("distributed path (collectThreshold = 0) is result-identical to local") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val local = BpeTrain.learnMerges(df, "text", numMerges = 8).collect()
    val dist = BpeTrain.learnMerges(df, "text", numMerges = 8,
      collectThreshold = 0L).collect()
    assert(dist.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq)
  }

  test("exhaustion: stops early when no pairs remain") {
    val got = BpeTrain.learnMerges(
      Seq((1L, "ab ab a b")).toDF("doc_id", "text"), "text", numMerges = 10)
      .collect()
    // only one mergeable pair exists; after ("a","b") every word is a
    // single symbol
    assert(got.length === 1)
    assert((got(0).getString(1), got(0).getString(2)) === ("a", "b"))
    assert(got(0).getLong(3) === 2L)
  }

  test("tie-break is (freq desc, left asc, right asc)") {
    // "xy" and "ab" both occur twice; "ab" wins the tie lexically,
    // then "xy"
    val got = BpeTrain.learnMerges(
      Seq((1L, "xy xy ab ab")).toDF("doc_id", "text"), "text", numMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("a", "b"), ("x", "y")))
  }

  test("merged symbols chain across iterations (greedy self-overlap)") {
    // "aaaa" ×3: pass 1 merges (a,a)→aa greedily (two per word),
    // pass 2 merges (aa,aa)
    val got = BpeTrain.learnMerges(
      Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text"), "text",
      numMerges = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(("a", "a", 9L), ("aa", "aa", 3L)))
  }
}
