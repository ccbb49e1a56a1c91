package graft

/** Dev main: print one key's oracle SQL to stdout (no SparkSession —
  * the oracle map is pure data), so new SQL can be smoke-tested against
  * DuckDB before a full Verify cycle. */
object OracleDump {
  def main(args: Array[String]): Unit =
    args.foreach { k =>
      println(s"-- KEY: $k")
      println(SparkEntry.oracleSql.getOrElse(k, s"<no oracle for $k>"))
      println("-- END")
    }
}
