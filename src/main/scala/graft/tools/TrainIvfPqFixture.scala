package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off artifact builder: trains the IVF-PQ fixture
  * (src/main/resources/graft/fixtures/ivfpq_artifacts.txt) consumed by
  * the q73 deployment-path gate. Kept in-repo so the fixture's
  * provenance is reproducible:
  *
  *   sbt "runMain graft.tools.TrainIvfPqFixture /root/testdata/sf0.01 \
  *     src/main/resources/graft/fixtures/ivfpq_artifacts.txt"
  *
  * Training is the OFFLINE half of IVF-PQ (the reference's analog: the
  * pgvector index built once and served many times,
  * Docs/SIMILARITY-PLAN.md:9-30); committing its output is what lets
  * the gate time the query path without misrepresenting a one-time
  * artifact build as per-query cost.
  */
object TrainIvfPqFixture {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outPath = args.lift(1)
      .getOrElse("src/main/resources/graft/fixtures/ivfpq_artifacts.txt")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables(spark, sfDir).embeddings
    val art = graft.operators.SimilaritySearch.trainIvfPqArtifacts(
      emb, nlist = 16, m = 8, ksub = 16, vecCol = "embedding", seed = 42L)
    val f = new java.io.File(outPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), "UTF-8")
    try graft.operators.SimilaritySearch.saveArtifacts(art, w)
    finally w.close()
    println(s"wrote ${f.getAbsolutePath}: m=${art.m} ksub=${art.ksub} " +
      s"dsub=${art.dsub} nlist=${art.nlist} dim=${art.dim}")
    spark.stop()
  }
}
