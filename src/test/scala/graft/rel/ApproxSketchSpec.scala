package graft.rel

import graft.SparkSpec

/** Error bounds for the mergeable-sketch aggregates vs their exact
  * counterparts (the HLL++ bound lives in NearDupSpec next to the other
  * approx-vs-exact cross-checks; this pins the percentile sketch).
  */
class ApproxSketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile lands within 2% of exact interpolated percentiles") {
    def byStatus(df: org.apache.spark.sql.DataFrame) =
      df.select("o_orderstatus", "p50", "p90", "p99")
        .as[(String, Double, Double, Double)]
        .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = byStatus(RelQueries.q39Percentiles(spark, sf0001))
    val approx = byStatus(ApproxQueries.approxPercentiles(spark, sf0001))
    assert(exact.keySet === approx.keySet)
    for ((status, (e50, e90, e99)) <- exact) {
      val (a50, a90, a99) = approx(status)
      // GK with accuracy 10000 is rank-exact at this SF; the residual
      // gap is interpolation (percentile_cont midpoints vs a real data
      // value), bounded by the local inter-order price gap ≪ 2%
      for ((e, a, p) <- Seq((e50, a50, "p50"), (e90, a90, "p90"), (e99, a99, "p99")))
        assert(math.abs(a - e) / e < 0.02,
          s"$status $p: approx $a vs exact $e off by ${math.abs(a - e) / e}")
    }
  }

  test("invariant-oracle rows: every sketch bound holds and the exact " +
      "columns agree with their exact counterparts") {
    val d = ApproxQueries.nqApproxDistinct(spark, sf0001).collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      for (c <- Seq("parts_in_bound", "supps_in_bound", "orders_in_bound"))
        assert(r.getBoolean(r.fieldIndex(c)),
          s"${r.getString(0)}: HLL++ estimate outside the 5% bound")
    }
    val p = ApproxQueries.nqApproxPercentiles(spark, sf0001).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      for (c <- Seq("p50_in_bound", "p90_in_bound", "p99_in_bound"))
        assert(r.getBoolean(r.fieldIndex(c)),
          s"${r.getString(0)}: GK estimate outside the rank-δ bound")
    }
    // the exact columns are q39's own values — one source of truth
    val e = RelQueries.q39Percentiles(spark, sf0001)
      .select("o_orderstatus", "p50", "p90", "p99")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    p.foreach { r =>
      val (e50, e90, e99) = e(r.getString(0))
      assert(r.getDouble(r.fieldIndex("p50_exact")) === e50)
      assert(r.getDouble(r.fieldIndex("p90_exact")) === e90)
      assert(r.getDouble(r.fieldIndex("p99_exact")) === e99)
    }
  }
}
