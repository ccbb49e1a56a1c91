package graft

/** Driver-contract guards that a refactor could silently break: the
  * grading hash-match requires every oracled output be totally ordered
  * (CLAUDE.md hard rule), and an oracle without a query (or vice versa
  * for oracled keys) would grade as a missing artifact. */
class ContractSpec extends SparkSuite {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every oracle SQL imposes a total ORDER BY") {
    // scan_parquet is a single global count — one row needs no order
    val unordered = SparkEntry.oracleSql.collect {
      case (k, sql) if k != "scan_parquet" && !sql.toUpperCase.contains("ORDER BY") => k
    }
    assert(unordered.isEmpty, s"oracles without ORDER BY: $unordered")
  }

  test("no oracle output computes a banned transcendental") {
    // ln/log/exp/pow diverge in last-ulp across engines (CLAUDE.md);
    // sqrt and arithmetic are IEEE-exact and allowed
    val banned = "(?i)\\b(ln|log|log2|log10|exp|pow|power)\\s*\\(".r
    val offenders = SparkEntry.oracleSql.collect {
      case (k, sql) if banned.findFirstIn(sql).isDefined => k
    }
    assert(offenders.isEmpty, s"transcendental in oracle SQL: $offenders")
  }
}
