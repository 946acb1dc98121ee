package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{RhpKernels, SignatureExpressions, SimHashExpression, TopKExpressions}

/** Edge-case pins for the native expressions, added with the round-7
  * expression review: empty/null-element inputs, shuffle round-trips
  * of nullable buffers, nullability-variant type checks, and the
  * structural-equality/derivation invariants of the RHP plane matrix.
  */
class NativeExpressionEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("SimHash64: empty token set yields null, not signature 0") {
    val df = Seq(
      (1L, Seq("alpha", "beta")),
      (2L, Seq.empty[String]),
      (3L, Seq.empty[String])).toDF("id", "toks")
      .select(col("id"), SimHashExpression.simhash64(col("toks")).as("sig"))
    val rows = df.orderBy("id").collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1), "empty doc must not get signature 0")
    assert(rows(2).isNullAt(1))
    // the old 0L behavior banded every empty doc with every other —
    // after the null fix the pair space excludes them entirely
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "   "), (3L, ""),
      (4L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 4L)), s"empty docs must not pair: $pairs")
  }

  test("md5 signature kernels skip null tokens instead of crashing") {
    // md5(NULL) is NULL in the relational twin and drops out of every
    // min()/sum() — the kernels must match, not NPE
    val df = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String](null, null)),
      (3L, Seq[String]("a", "b"))).toDF("id", "toks")
    val mh = df.select(col("id"),
        SignatureExpressions.md5MinHashes(col("toks"), 8).as("mh"))
      .orderBy("id").collect()
    assert(!mh(0).isNullAt(1))
    assert(mh(1).isNullAt(1), "all-null tokens ≡ empty → null")
    // null-skipping means row 1 ≡ row 3 exactly
    assert(mh(0).getStruct(1) === mh(2).getStruct(1))
    val sh = df.select(col("id"),
        SimHashExpression.md5SimHash60(col("toks")).as("sig"))
      .orderBy("id").collect()
    assert(!sh(0).isNullAt(1))
    assert(sh(1).isNullAt(1))
    assert(sh(0).getLong(1) === sh(2).getLong(1))
  }

  test("SortedArrayIntersectCount accepts containsNull-variant arrays") {
    // a natively computed containsNull=false signature vs the same
    // data arriving containsNull=true (every parquet round-trip does
    // this); full-dataType equality used to fail analysis
    import org.apache.spark.sql.graft.ArrayExpressions.sortedIntersectCount
    val df = Seq((Seq(1L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
      .select(col("a"),
        // transform() yields containsNull=true even for a no-op lambda
        transform(col("b"), x => x).as("b_nullable"))
    val got = df.select(
      sortedIntersectCount(col("a"), col("b_nullable")).as("n"))
      .collect()(0).getInt(0)
    assert(got === 2)
  }

  test("BoundedSortedCollect round-trips null elements through the shuffle") {
    import TopKExpressions.boundedSortedCollect
    // arrays with null elements, forced through partial aggregation
    // (repartition → serialize/deserialize of the typed buffer)
    val rows = Seq(
      ("g", Seq[java.lang.Double](1.0, null, 3.0)),
      ("g", Seq[java.lang.Double](0.5, 2.0)),
      ("g", Seq[java.lang.Double](null, 9.0)),
      ("g", Seq[java.lang.Double](4.0, 4.0)))
    val df = rows.toDF("k", "v").repartition(4, col("k"))
    val viaAgg = df.groupBy("k")
      .agg(boundedSortedCollect(col("v"), 3).as("kept"))
    val viaRef = df.groupBy("k")
      .agg(slice(array_sort(collect_list(col("v"))), 1, 3).as("kept"))
    val a = viaAgg.select(explode(col("kept"))).collect().map(_.get(0).toString)
    val r = viaRef.select(explode(col("kept"))).collect().map(_.get(0).toString)
    assert(a.toSeq === r.toSeq,
      s"agg ${a.toSeq} vs reference ${r.toSeq}")
  }

  test("RHP plane matrix: bytes-direct derivation matches hex parsing; deep equality") {
    // planeComponent reads 60 bits off the digest bytes; pin it
    // against the literal hex-string derivation the oracle uses
    for ((t, p, d) <- Seq((0, 0, 0), (1, 3, 7), (3, 7, 63))) {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$t:$p:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expected =
        (java.lang.Long.parseLong(hex.substring(0, 15), 16) - (1L << 59))
          .toDouble / 576460752303423488.0
      assert(RhpKernels.planeComponent(t, p, d) === expected, s"($t,$p,$d)")
    }
    // separately computed identical matrices → equal expressions
    // (structural, not reference, equality — semanticEquals reuse)
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.graft.RhpDecimalBuckets
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val child = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val e1 = RhpDecimalBuckets(child, RhpKernels.planeMatrix(2, 4, 8), 4)
    val e2 = RhpDecimalBuckets(child, RhpKernels.planeMatrix(2, 4, 8), 4)
    assert(e1 === e2)
    assert(e1.hashCode === e2.hashCode)
    assert(e1 !== RhpDecimalBuckets(child, RhpKernels.planeMatrix(2, 4, 7), 4))
  }

  test("every graft SQL function registers through the single inventory") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    // one smoke call per scalar family that had a (now removed)
    // drifted per-file register
    val r = spark.sql(
      """SELECT graft_simhash64(array('a','b')) s64,
        |  graft_md5_simhash(array('a','b')) s60,
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) c,
        |  graft_sorted_intersect_count(array(1L,2L), array(2L,3L)) n,
        |  graft_minhash(array('a'), 4) mh,
        |  graft_md5_minhash(array('a'), 4) mmh,
        |  graft_rhp_sig(array(0.5d, -0.5d), 4, 0) rhp,
        |  graft_winnow_mins(array(5L,1L,3L), 2) wm""".stripMargin)
      .collect()(0)
    assert(!r.anyNull)
  }
}
