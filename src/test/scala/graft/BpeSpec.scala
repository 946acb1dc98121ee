package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train: classic low/lower/newest corpus produces the textbook merges") {
    // Sennrich's worked example shape: es, est, est</w> emerge from
    // the -est suffix mass; ties break lexicographically so the
    // sequence is pinned, not flaky.
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(vocab, 4)
    assert(merges.take(3) === Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    // 4th merge: "l o" (count 7: low×5 + lower×2) beats everything else
    assert(merges(3) === ("l", "o"))
  }

  test("encodeWord applies merges greedily by rank, stops when none apply") {
    val ranks = Bpe.loadMerges(Iterator("e s", "es t", "est </w>", "l o", "lo w"))
    assert(Bpe.encodeWord("newest", ranks) === Vector("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("low", ranks) === Vector("low", "</w>"))
    // unseen word: falls back to characters + end marker
    assert(Bpe.encodeWord("xyz", ranks) === Vector("x", "y", "z", "</w>"))
  }

  test("train → encode round trip: frequent training words encode compactly") {
    val docs = Seq((0L, "the cat sat on the mat the cat sat"),
      (1L, "the mat the cat")).toDF("doc_id", "text")
    val merges = Bpe.trainOnCorpus(docs, "text", 50)
    val ranks = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // with enough merges every training word collapses to one token
    assert(Bpe.encodeWord("the", ranks).length === 1)
    assert(Bpe.encodeWord("cat", ranks).length === 1)
  }

  test("q37 counts match the independent Python reference on the fixture vocab") {
    val fixture = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/graft/bpe_counts_fixture.json"), "UTF-8")
      val txt = try src.mkString finally src.close()
      // flat {"id": count} object — parse without a JSON library
      "\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(txt)
        .map(m => m.group(1).toLong -> m.group(2).toInt).toMap
    }
    assert(fixture.size === 40)
    val got = Bpe.encodeCounts(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .filter(col("doc_id") < 40)
          .repartition(7), // exercise the per-partition memo across partitions
        "doc_id", "text", Bpe.mergesFixture)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === fixture)
  }

  test("encodeCounts is deterministic and zero-shuffle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Bpe.encodeCounts(docs, "doc_id", "text", Bpe.mergesFixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "BPE encoding must not shuffle")
    val a = Bpe.encodeCounts(docs, "doc_id", "text", Bpe.mergesFixture)
      .agg(sum(col("bpe_tokens"))).collect()(0).getLong(0)
    val b = Bpe.encodeCounts(docs, "doc_id", "text", Bpe.mergesFixture)
      .agg(sum(col("bpe_tokens"))).collect()(0).getLong(0)
    assert(a === b && a > 0)
  }
}
