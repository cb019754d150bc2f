package graft.rel

import graft.SparkSpec

/** Holt smoothing: exact linear extrapolation, hand-checked
  * recurrence, order-invariance. */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  private def series(k: String, ys: Seq[Long]) =
    ys.zipWithIndex.map { case (y, i) => (k, i.toLong, y) }

  test("a perfectly linear series is extrapolated exactly: the " +
      "recurrence is a fixed point on the line") {
    // y = 100 + 50·t cents: level tracks y_n, trend stays the slope
    val pts = series("lin", (0 to 9).map(t => 100L + 50L * t))
      .toDF("k", "w", "y_cents")
    val r = Forecast.holt(pts, "k", "w").collect().head
    assert(r.getInt(1) == 10)
    assert(r.getDouble(2) == 5.5)   // level = y_10 = 550c = 5.50
    assert(r.getDouble(3) == 0.5)   // trend = 50c
    assert(r.getDouble(4) == 6.0)   // f1
    assert(r.getDouble(5) == 7.5)   // f4 = 5.5 + 4·0.5
  }

  test("recurrence matches the hand-computed values on a 3-point " +
      "series") {
    // y = 10.00, 20.00, 14.00; α=0.5 β=0.3
    // init l=10, b=10 → t2: l=0.5·20+0.5·20=20, b=0.3·10+0.7·10=10
    // t3: l=0.5·14+0.5·30=22, b=0.3·2+0.7·10=7.6
    val pts = series("s", Seq(1000L, 2000L, 1400L))
      .toDF("k", "w", "y_cents")
    val r = Forecast.holt(pts, "k", "w").collect().head
    assert(r.getDouble(2) == 22.0 && r.getDouble(3) == 7.6)
    assert(r.getDouble(4) == 29.6)
    assert(r.getDouble(5) == 52.4)
  }

  test("single-point series are dropped; arrival order is irrelevant") {
    val one = series("solo", Seq(500L))
    val shuffled = series("lin", (0 to 9).map(t => 100L + 50L * t)).reverse
    val out = Forecast.holt((one ++ shuffled).toDF("k", "w", "y_cents"),
      "k", "w").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("lin"))
    assert(out.head.getDouble(5) == 7.5) // same as the ordered run
  }
}
