package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off artifact builder: trains the portable quality-classifier
  * weight fixture (src/main/resources/graft/fixtures/quality_lr.txt)
  * consumed by the q77 oracle gate. Kept in-repo so the fixture's
  * provenance is reproducible:
  *
  *   sbt "runMain graft.tools.TrainQualityLrFixture /root/testdata/sf0.01 \
  *     src/main/resources/graft/fixtures/quality_lr.txt"
  *
  * The featurization is the PORTABLE one (md5-bucket counts — the
  * trained weights only make sense against the same buckets the
  * scorer and the SQL oracle re-derive); labels distill the q13
  * heuristic exactly like q68's in-query training; 256 buckets keep
  * the committed artifact (and the oracle's embedded VALUES list)
  * small. Training is the OFFLINE half — committing its output is
  * what lets the gate verify the SCORING arithmetic without
  * misrepresenting a one-time model fit as per-query cost.
  */
object TrainQualityLrFixture {
  val NumFeatures = 256

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = args.lift(1)
      .getOrElse("src/main/resources/graft/fixtures/quality_lr.txt")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.TextFunctions.qualityScore
    import graft.operators.QualityClassifier

    val d = graft.Tables(spark, sfDir).documents
    // label threshold 0.97 ≈ the corpus median: the synthetic corpus
    // is uniformly high-quality (min heuristic score 0.888, so q68's
    // 0.75 would be one-class and L-BFGS would diverge to an
    // Infinity intercept); the median split gives the fixture a real
    // decision boundary to learn
    val labeled = d.filter(col("doc_id") % 2 === 0)
      .withColumn("label", (qualityScore(col("text")) >= 0.97).cast("double"))
    // dense 256-bucket count vectors from the PORTABLE featurization
    val counts = QualityClassifier.portableFeatureCounts(
        labeled, "doc_id", "text", NumFeatures)
      .groupBy(col("id"))
      .agg(map_from_arrays(collect_list(col("bucket")),
        collect_list(col("n").cast("double"))).as("m"))
      .select(col("id"), array_to_vector(
        transform(sequence(lit(0), lit(NumFeatures - 1)),
          b => coalesce(element_at(col("m"), b), lit(0.0)))).as("features"))
    val train = counts.join(
      labeled.select(col("doc_id").as("id"), col("label")), "id")
    val model = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setMaxIter(50).setRegParam(0.01)
      .fit(train)
    val weights = model.coefficients.toArray
    require(weights.length == NumFeatures)
    val f = new java.io.File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), "UTF-8")
    try QualityClassifier.saveWeights(weights, model.intercept, w)
    finally w.close()
    println(s"wrote ${f.getAbsolutePath}: ${weights.length} weights, " +
      s"intercept ${model.intercept}")
    spark.stop()
  }
}
