package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — the class of regression that cost rounds
  * 2–3 their "no-oracle rows": every registered query must carry an
  * oracle, names must be unique, and both exported maps must stay in
  * lock-step. Mostly pure metadata checks; the loader-schema pin at the
  * bottom is the one test that touches Spark. */
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

  // Not a pure metadata check, but it lives here because it guards the same
  // driver contract: the generator has already changed events.ts's parquet
  // flavor once (TIMESTAMP(NANOS) → micros/NTZ, which broke q_sessionize in
  // the driver's run, round 6). Pin the LOADER's output type so the next
  // silent testdata change fails loudly in-repo.
  test("Tables.events normalizes ts to TIMESTAMP for any parquet flavor") {
    import org.apache.spark.sql.types.TimestampType
    val ts = Tables.events(TestSpark.spark, TestSpark.sf).schema("ts").dataType
    assert(ts == TimestampType, s"events.ts read as $ts — loader must normalize")
  }
}
