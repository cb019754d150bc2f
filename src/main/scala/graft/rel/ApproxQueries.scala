package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sketch-based aggregates (SURVEY §2.K): HLL++ approximate distinct.
  * The 100 TB story: exact countDistinct (q11) needs a two-phase
  * shuffle of every distinct key; HLL++ reduces that to fixed-size
  * mergeable sketches (map-side partials, constant network). DuckDB's
  * approx_count_distinct uses a different HLL implementation, so values
  * aren't oracle-comparable → rows-only check here, and the test suite
  * asserts relative error vs the exact counts instead.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_approx_distinct" -> (approxDistinct _))
}
