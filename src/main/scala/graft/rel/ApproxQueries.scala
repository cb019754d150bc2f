package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch-based aggregates (SURVEY §2.K): HLL++ approximate distinct
  * and KLL-style approximate percentiles.
  * The 100 TB story: exact countDistinct (q11) needs a two-phase
  * shuffle of every distinct key, and exact percentile_cont (q39)
  * buffers every group value for the interpolation sort — both sketches
  * reduce that to fixed-size mergeable summaries (map-side partials,
  * constant network). The sketch implementations differ between engines,
  * so values aren't oracle-comparable → rows-only checks here, and the
  * test suite asserts bounded error vs the exact queries instead.
  */
object ApproxQueries {

  def approxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
        approx_count_distinct("l_suppkey", 0.02).as("approx_supps"),
        approx_count_distinct("l_orderkey", 0.02).as("approx_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** q39's percentiles as a mergeable sketch: `approx_percentile`
    * (Greenwald–Khanna in Spark) with accuracy 10000 → rank error
    * ≤ 1/10000 of the group size. Same grouping, same output shape as
    * q39, so ApproxSketchSpec can assert the sketch lands within
    * rank-error bounds of the exact interpolated values.
    */
  def approxPercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 2).as("p50"),
        round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 2).as("p90"),
        round(expr("approx_percentile(o_totalprice, 0.99, 10000)"), 2).as("p99"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_approx_distinct" -> (approxDistinct _),
    "nq_approx_percentiles" -> (approxPercentiles _))
}
