package graft

import graft.operators.Quantization
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization (q66): hand-derived codes, the structural
  * (max−min)/510 error bound, flat-vector exactness, and
  * cosine-preservation on random vectors.
  */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("codes and round-trip on a hand-derived vector") {
    // xs = [0, 1, 2]: qmin=0, qscale=2/255; code(1) = floor(127.5+0.5)=128
    val enc = Quantization.sq8Encode(
      Seq((1L, Seq(0f, 1f, 2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()(0)
    assert(enc.getDouble(1) === 0.0)
    assert(math.abs(enc.getDouble(2) - 2.0 / 255) < 1e-15)
    assert(enc.getSeq[Int](3) === Seq(0, 128, 255))
    // decode: code 128 → 128·2/255 = 1.00392…, |err| ≤ qscale/2
    val st = Quantization.sq8ErrorStats(
      Seq((1L, Seq(0f, 1f, 2f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()(0)
    assert(st.getLong(1) === 3L)
    // max_abs_err is the round(err, 9) value — allow the half-ulp of
    // that rounding over the raw qscale/2 bound
    assert(st.getDouble(2) <= (2.0 / 255) / 2 + 1e-9)
  }

  test("flat and empty-range vectors decode exactly") {
    val st = Quantization.sq8ErrorStats(
      Seq((1L, Seq(3.5f, 3.5f, 3.5f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").collect()(0)
    assert(st.getDouble(2) === 0.0 && st.getDouble(3) === 0.0)
  }

  test("error bound (max-min)/510 holds on random vectors; cosine survives") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L)
      .map(i => (i, Seq.fill(64)(rnd.nextFloat() * 4 - 2)))
    val df = vecs.toDF("vec_id", "embedding")
    val stats = Quantization.sq8ErrorStats(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ranges = vecs.map { case (i, xs) => i -> (xs.max - xs.min) }.toMap
    stats.foreach { case (i, err) =>
      assert(err <= ranges(i) / 510.0 + 1e-9, s"vector $i exceeds the bound")
    }
    // cosine between original and decoded stays ~1 (the ANN-rerank
    // fidelity the 4x compression must preserve)
    val dec = Quantization.sq8Decode(
      Quantization.sq8Encode(df, "vec_id", "embedding"))
      .select(col("id"), col("decoded")).as[(Long, Seq[Double])]
      .collect().toMap
    vecs.foreach { case (i, xs) =>
      val d = dec(i)
      val dot = xs.zip(d).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(xs.map(x => x.toDouble * x).sum) *
        math.sqrt(d.map(x => x * x).sum))
      assert(cos > 0.9999, s"vector $i cosine $cos")
    }
  }
}
