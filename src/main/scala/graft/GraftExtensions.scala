package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions injector — the deployment path for the
  * graft native functions:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)`). Unlike the
  * temp-function path ([[GraftSql.registerAll]]), injected functions
  * are part of the session BUILD: they exist in every session the
  * cluster creates — including `newSession()` clones and
  * thriftserver/Connect sessions that never run library code — so a
  * SQL-only user gets `graft_cosine`, `graft_top_k`, `graft_minhash`,
  * … with zero imperative setup. The function inventory itself is
  * single-sourced in [[org.apache.spark.sql.graft.GraftFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.GraftFunctions.injectable.foreach {
      case (ident, info, builder) =>
        extensions.injectFunction((ident, info, builder))
    }
}
