package graft.tools

/** Print a catalog query's oracle SQL to stdout — lets the DuckDB
  * half of a gate be prototyped/debugged without running any Spark
  * job (the SQL texts are pure string construction).
  *
  * Run: sbt "runMain graft.tools.DumpOracle <queryName>"
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DumpOracle <queryName>")
    graft.QueryCatalog.byName(args(0)).oracle match {
      case Some(sql) => println(sql)
      case None => println(s"-- ${args(0)} has no oracle (rows-only)")
    }
  }
}
