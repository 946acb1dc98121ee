package graft

import graft.queries._

/** Single registry of every implemented query (SURVEY.md §2 coverage).
  * SparkEntry / Verify / Bench all read from here.
  */
object QueryCatalog {
  def all: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ EventQueries.all ++ AdvancedQueries.all ++
      PipelineQueries.all ++ CurationQueries.all ++ MediaQueries.all

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
  def headline: Seq[Q] = all.filter(_.headline)
}
