package graft

import graft.operators.NgramLm
import org.apache.spark.sql.functions._

/** Bigram-LM fluency scoring (q60): hand-computed probabilities on a
  * tiny corpus pin the smoothing formula, the OOV paths (unseen
  * bigram vs unseen head), the short-doc guard, and the exact-decimal
  * accumulation.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // train corpus: "a b a b" → V = {a, b} = 2;
  // bigrams: (a,b)=2, (b,a)=1; heads: a=2, b=1
  private lazy val trainDocs = Seq((1L, "a b a b")).toDF("doc_id", "text")
  private lazy val model = NgramLm.train(trainDocs, "text")

  test("model counts match hand derivation") {
    val bg = model.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    val heads = model.heads.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(heads === Map("a" -> 2L, "b" -> 1L))
    assert(model.vocab.head.getLong(0) === 2L)
  }

  test("score: seen bigram, unseen bigram with seen head, unseen head") {
    val docs = Seq(
      (10L, "a b c"), // (a,b): p=(2+1)/(2+2)=0.75; (b,c): p=1/(1+2) — oov
      (11L, "c a"),   // (c,a): unseen head → p=1/(0+2)=0.5 — oov
      (12L, "x"))     // < 2 tokens
      .toDF("doc_id", "text")
    val got = NgramLm.score(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()

    val r10 = got(0)
    assert(r10.getLong(1) === 2L) // n_bigrams
    assert(r10.getLong(2) === 1L) // n_oov: (b,c)
    // bits = -round(log2(0.75),6) + -round(log2(1/3),6)
    //      = 0.415037 + 1.584963 = 2.000000 exactly (decimal sum)
    assert(math.abs(r10.getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(r10.getDouble(4) - 1.0) < 1e-12)

    val r11 = got(1)
    assert(r11.getLong(1) === 1L)
    assert(r11.getLong(2) === 1L)
    assert(math.abs(r11.getDouble(3) - 1.0) < 1e-12) // -log2(0.5) = 1

    val r12 = got(2)
    assert(r12.getLong(1) === 0L)
    assert(r12.getLong(2) === 0L)
    assert(r12.isNullAt(3) && r12.isNullAt(4))
  }

  test("conditional normalizes: head count equals sum of its bigram counts") {
    // on a bigger random corpus the head relation must be the exact
    // marginal of the bigram relation — the property that makes the
    // smoothed conditional a probability distribution
    val rnd = new scala.util.Random(3)
    val words = Vector("u", "v", "w", "x", "y")
    val docs = (0L until 40L)
      .map(i => (i, Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text")
    val bad = m.bigrams.groupBy("w1").agg(sum("c").as("s"))
      .join(m.heads, "w1")
      .filter(col("s") =!= col("c1")).count()
    assert(bad === 0L)
  }

  test("fluent text scores lower than shuffled text under its own model") {
    // CCNet's premise: in-domain word order is cheaper than scrambled
    val fluent = (0L until 30L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(fluent, "text")
    val probe = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "dog the over quick lazy jumps fox brown the"))
      .toDF("doc_id", "text")
    val bits = NgramLm.score(probe, "doc_id", "text", m)
      .orderBy("doc_id").collect().map(_.getDouble(4))
    assert(bits(0) < bits(1))
  }
}
