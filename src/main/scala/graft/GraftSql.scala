package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register the harness tables as temp views and the
  * native graft functions, so the whole catalog is queryable via
  * `spark.sql` (A14's cube/rollup/grouping-sets come free here).
  */
object GraftSql {
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val t = Tables(spark, dir)
    // the ONE table inventory (a parallel name-only list had already
    // started to drift-risk; derive nothing, list once)
    Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
    // one inventory behind both this path and graft.GraftExtensions
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
  }
}
