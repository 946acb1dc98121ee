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
    graft.QueryCatalog.byName.get(args(0)) match {
      case None =>
        System.err.println(s"unknown query '${args(0)}'. Known names:")
        graft.QueryCatalog.byName.keys.toSeq.sorted
          .foreach(n => System.err.println(s"  $n"))
        sys.exit(2)
      case Some(q) => q.oracle match {
        case Some(sql) => println(sql)
        case None => println(s"-- ${args(0)} has no oracle (rows-only)")
      }
    }
  }
}
