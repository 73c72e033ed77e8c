package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — the class of regression that cost rounds
  * 2–3 their "no-oracle rows": every registered query must carry an
  * oracle, names must be unique, and both exported maps must stay in
  * lock-step. Pure metadata checks, no Spark session. */
class ContractSpec extends AnyFunSuite {

  test("every registered query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (driver records only a weak rows-check): $missing")
  }

  test("no orphan oracles, no silent name collisions") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    // the maps are built from one list; a duplicated name would silently
    // drop an entry in the Map conversion — compare against the raw count
    assert(SparkEntry.queries.size >= 145,
      s"query registry shrank to ${SparkEntry.queries.size} — duplicate name?")
  }

  test("oracle SQL never uses list_reduce (DuckDB 1.0.0 mis-folds batches)") {
    val offenders = SparkEntry.oracleSql.filter(_._2.contains("list_reduce")).keys
    assert(offenders.isEmpty, s"list_reduce-based oracles: $offenders")
  }
}
