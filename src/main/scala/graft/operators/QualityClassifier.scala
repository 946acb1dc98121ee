package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained quality classification — the discriminative sibling of the
  * q60 n-gram LM: a linear classifier over hashed bag-of-token
  * features, the fastText-style quality filter of the GPT-3/DataComp/
  * phi lineage (classify "does this look like the trusted corpus /
  * pass the heuristic", then keep the confident tail). Where q60
  * models FLUENCY generatively, this learns any labeling — including
  * distilling a hand-tuned heuristic into a model that generalizes
  * past the heuristic's blind spots (the q68 gate trains exactly
  * that way: labels from the q13 quality score, features from raw
  * tokens the heuristic never sees individually).
  *
  * Spark-first shape: featurization is `HashingTF` over the token
  * array (fixed-width sparse vectors, no vocabulary state — the
  * hashing trick is what makes the featurizer corpus-size-free);
  * training is spark.ml LogisticRegression (distributed L-BFGS: each
  * iteration is one treeAggregate of gradient partials — map-side
  * combined, model-sized not corpus-sized); scoring broadcasts the
  * coefficient vector and is a zero-shuffle per-row projection. The
  * model artifact (coefficients) persists like the LM relations and
  * the bloom/IVF/PQ codebooks.
  */
object QualityClassifier {

  /** (id, toks, features) — hashed bag-of-tokens featurization. */
  private def featurize(docs: DataFrame, idCol: String, textCol: String,
      numFeatures: Int): DataFrame =
    new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
      .transform(docs.withColumn("__toks", tokens(col(textCol))))

  /** Train on (textCol, labelCol ∈ {0, 1}) rows. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 12, maxIter: Int = 50,
      regParam: Double = 0.01): LogisticRegressionModel =
    new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(featurize(
        labeled.withColumn("__label", col(labelCol).cast("double")),
        "", textCol, numFeatures))

  /** Score: (idCol, p_quality) — the model's P(label = 1), rounded
    * to 6 (scores feed threshold filters; sub-ulp noise must not). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LogisticRegressionModel,
      numFeatures: Int = 1 << 12): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.setFeaturesCol("features")
      .transform(featurize(docs, idCol, textCol, numFeatures))
      .select(col(idCol),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("p_quality"))
  }
}
