package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The OLS trend aggregate's contract: exact-collinear points recover
  * the line exactly (slope, intercept, r² = 1 with no float slack —
  * the moments are exact), degenerate groups null out instead of
  * dividing by zero, the fit agrees with Spark's built-in regr_*
  * family to float precision on real data, and the exact-moment path
  * is layout-invariant where the built-in need not be.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("collinear points recover slope/intercept/r2 exactly") {
    // y_cents = 200·x + 1500 → slope 2.00 (value units), intercept
    // 15.00, r² = 1 — every moment is a small exact integer, so the
    // double tail is exact arithmetic and the equalities are ==
    val pts = (1L to 9L).map(x => ("a", x, 200L * x + 1500L)).toDF(
      "g", "x", "y_cents")
    val r = Trend.olsFit(pts, "g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(r == (("a", 9L, Some(2.0), Some(15.0), Some(1.0))))
  }

  test("degenerate groups null the fit instead of dividing by zero") {
    val pts = Seq(
      ("single", 5L, 100L), // one point: den = 0 → no slope
      ("const_y", 1L, 700L), ("const_y", 2L, 700L), ("const_y", 3L, 700L))
      .toDF("g", "x", "y_cents")
    val r = Trend.olsFit(pts, "g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r("single")._3.isEmpty && r("single")._5.isEmpty)
    // constant y over varying x: slope exactly 0, but r² undefined
    // (zero variance to explain)
    assert(r("const_y")._3 == Some(0.0) && r("const_y")._5.isEmpty)
  }

  test("matches Spark's regr_slope/regr_intercept/regr_r2 on real data") {
    val got = Trend.q90TrendOls(spark, sf0001)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    val pts = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001),
        $"o_custkey" === $"c_custkey")
      .join(graft.Tables.nation(spark, sf0001),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"),
        (year($"o_orderdate") * lit(12) + month($"o_orderdate") - lit(1))
          .cast("long").as("x"))
      .agg((sum(floor($"o_totalprice" * 100.0 + 0.5)) / 100.0).as("y"))
    val ref = pts.groupBy("nation")
      .agg(regr_slope($"y", $"x").as("s"), regr_intercept($"y", $"x").as("i"),
        regr_r2($"y", $"x").as("r"))
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (nation, (_, _, s, i, r)) =>
      val (_, rs, ri, rr) = ref(nation)
      def close(a: Option[Double], b: Option[Double], what: String) =
        (a, b) match {
          case (Some(x), Some(y)) =>
            assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.abs(y)),
              s"$nation $what: exact-moment $x vs regr $y")
          case _ => assert(a.isDefined == b.isDefined, s"$nation $what")
        }
      close(s, rs, "slope"); close(i, ri, "intercept"); close(r, rr, "r2")
    }
  }

  test("incomplete points are dropped, not half-counted") {
    val pts = Seq(
      (Some(1L), Some(200L + 1500L)), (Some(9L), Some(1800L + 1500L)),
      (None, Some(7L)), (Some(5L), None))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y_cents")
    val r = Trend.olsFit(pts, "g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    // only the two complete collinear points (y = 200x + 1500... the
    // first point is x=1, y=1700; second x=9, y=3300 → slope 2.00)
    assert(r._2 == 2L && r._3 == Some(2.0))
  }

  test("layout-invariant: same fit at any parallelism") {
    val pts = (1L to 500L).map(x => ("g" + (x % 3), x, x * x * 7L % 100000L))
      .toDF("g", "x", "y_cents")
    val a = Trend.olsFit(pts, "g").orderBy("g").collect().toSeq
    val b = Trend.olsFit(pts.repartition(13), "g").orderBy("g")
      .collect().toSeq
    assert(a == b)
  }
}
