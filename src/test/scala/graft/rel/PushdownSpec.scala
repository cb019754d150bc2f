package graft.rel

import graft.SparkSpec

/** Pins the scan-efficiency properties the 100 TB design depends on:
  * predicates reach the parquet reader (PushedFilters) and projection
  * prunes the read schema. A regression here silently multiplies IO at
  * scale, so it's asserted, not just inspected manually.
  */
class PushdownSpec extends SparkSpec {

  private def planOf(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("q02: shipdate/quantity predicates are pushed to the parquet scan") {
    val plan = planOf("q02_filter_project")
    // NB: the rendered PushedFilters list is truncated with "...", so
    // assert on the filters that appear before the cut
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity)"),
      plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
  }

  test("q02: read schema pruned to the referenced columns only") {
    val plan = planOf("q02_filter_project")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // needs exactly orderkey, linenumber, price, discount, quantity, shipdate
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_partkey"), s"l_partkey not pruned: $readSchema")
    assert(!readSchema.contains("l_returnflag"), s"l_returnflag not pruned: $readSchema")
    assert(!readSchema.contains("l_tax"), s"l_tax not pruned: $readSchema")
  }

  test("q01: aggregate does map-side partials before the exchange") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("partial_sum"), s"no partial aggregation:\n$plan")
  }

  test("q05: dimension joins are broadcast, not shuffled") {
    val plan = planOf("q05_nation_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"dims should broadcast at this size:\n$plan")
  }
}
