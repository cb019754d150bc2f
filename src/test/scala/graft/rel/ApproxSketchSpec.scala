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
}
