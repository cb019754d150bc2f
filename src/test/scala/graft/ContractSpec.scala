package graft

/** Driver-contract invariants: every oracle key must name a real query,
  * every Bench headline must resolve, and the flagship entry returns
  * rows — the exact checks the driver's harness depends on.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every Bench headline name resolves to a query") {
    val missing = Bench.headline.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"headline names without queries: $missing")
  }

  test("oracle-checked queries dominate the catalog") {
    val n = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    assert(o >= 50, s"oracle coverage regressed: $o")
    assert(n >= o, s"queries=$n < oracle=$o")
  }

  test("flagship entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
