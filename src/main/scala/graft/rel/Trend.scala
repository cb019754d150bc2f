package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Distributed per-group ordinary least squares — trend analysis as one
  * aggregate (the `regr_slope`/`regr_r2` capability), built on EXACT
  * moments so the answers replicate bit-for-bit across engines.
  *
  * OLS over a group's (x, y) points needs five sufficient statistics —
  * Σx, Σy, Σxy, Σx², Σy² — all ADDITIVE, so the whole fit is one
  * map-side-combined aggregate however large the group (the same
  * commutative-semigroup shape as AggStore; at 100 TB the slope of a
  * billion points costs one scan and a groups-sized exchange).
  * Built-in `regr_slope` accumulates DOUBLE moments whose addition
  * order perturbs the last bits per partitioning; here y is quantized
  * to integer cents and the moments are summed as DECIMAL(38,0) —
  * exact and associative — then slope/intercept/r² derive through one
  * FIXED double expression tree (divisions and multiplies of exactly-
  * cast operands; the oracle replicates every step). Degenerate groups
  * stay honest: a single point (or constant x) nulls the slope, a
  * constant y nulls r².
  */
object Trend {

  private val dt = DecimalType(38, 0)

  /** Per-group OLS of y-cents against integer x:
    * (groupCol, n_points, slope, intercept, r2) — slope/intercept in
    * value units (cents/100) per unit x. `ptsy` must carry integral
    * `x` and exact integral `y_cents` (cents ≤ ~10^16: squares are
    * decimal, sums stay within DECIMAL(38,0) by a wide margin). */
  def olsFit(pts: DataFrame, groupCol: String): DataFrame = {
    // a null x or y would be counted by n_points but skipped by the
    // sums — inconsistent moments; incomplete points are dropped
    val clean = pts.filter(col("x").isNotNull && col("y_cents").isNotNull)
    val y = col("y_cents").cast(dt)
    val m = clean.groupBy(groupCol).agg(
      count(lit(1)).as("n_points"),
      sum(col("x")).as("sx"),
      sum(y).as("sy"),
      sum(col("x").cast(dt) * y).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(y * y).as("syy"))
    val nd = col("n_points").cast("double")
    val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double")
    val sxyd = col("sxy").cast("double")
    val sxxd = col("sxx").cast("double")
    val syyd = col("syy").cast("double")
    val num = nd * sxyd - sxd * syd
    val den = nd * sxxd - sxd * sxd
    val varY = nd * syyd - syd * syd
    m.select(col(groupCol), col("n_points"),
      when(den =!= 0.0, num / den / lit(100.0)).as("slope"),
      when(den =!= 0.0,
        (syd - num / den * sxd) / nd / lit(100.0)).as("intercept"),
      when(den =!= 0.0 && varY =!= 0.0,
        num * num / (den * varY)).as("r2"))
  }

  /** Driver entry: the monthly-revenue trend per nation — orders
    * joined through customer to nation (both dimension joins
    * broadcast), months collapsed to exact cents revenue points
    * (x = year·12 + month − 1), then one OLS aggregate. */
  def q90TrendOls(s: SparkSession, d: String): DataFrame = {
    val pts = orders(s, d)
      .join(broadcast(customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate"))
          - lit(1)).cast("long").as("x"))
      .agg(sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5))
        .cast("long").cast(dt)).as("y_cents"))
    olsFit(pts, "nation").orderBy("nation")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_trend_ols" -> (q90TrendOls _))

  // Oracle: exact integer moments (HUGEINT in DuckDB, DECIMAL(38,0) in
  // Spark — same integers, same correctly-rounded double casts), then
  // the identical expression tree for slope/intercept/r².
  val oracle: Map[String, String] = Map(
    "q90_trend_ols" ->
      """WITH pts AS (
        |  SELECT n.n_name AS nation,
        |    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
        |      AS BIGINT) AS x,
        |    sum(CAST(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
        |      AS HUGEINT)) AS y
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE o.o_orderdate IS NOT NULL AND o.o_totalprice IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT nation, count(*) AS n_points,
        |    CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(x) AS DOUBLE) AS sxd,
        |    CAST(sum(y) AS DOUBLE) AS syd,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxyd,
        |    CAST(sum(x * x) AS DOUBLE) AS sxxd,
        |    CAST(sum(y * y) AS DOUBLE) AS syyd
        |  FROM pts GROUP BY nation)
        |SELECT nation, n_points,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) / 100.0
        |  END AS slope,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
        |      / nd / 100.0
        |  END AS intercept,
        |  CASE WHEN nd * sxxd - sxd * sxd <> 0.0
        |        AND nd * syyd - syd * syd <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
        |      / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        |  END AS r2
        |FROM m ORDER BY nation""".stripMargin)
}
