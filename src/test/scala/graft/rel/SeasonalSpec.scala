package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seasonal decomposition: a pure daily cycle decomposes to constant
  * trend + the cycle + EXACTLY zero residual (the ×24 fixed-point
  * argument — no tolerance), a linear ramp yields zero seasonality,
  * missing hours zero-fill, and the 2×24 MA nulls at the edges.
  */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  /** events-shaped frame: one row per event, `n(h)` copies at hour h */
  private def series(counts: Seq[Int], eventType: String = "a") = {
    val t0 = 1704067200L // 2024-01-01 00:00 UTC
    counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)((eventType, t0 + i * 3600L))
    }.toDF("event_type", "epoch")
      .select(col("event_type"), timestamp_seconds(col("epoch")).as("ts"))
  }

  test("pure daily cycle: constant trend, the cycle as seasonal, " +
      "residual EXACTLY zero (dyadic fixed-point, no tolerance)") {
    // all slots ≥ 1 so the series bounds span full days (a zero first/
    // last hour would shrink the observed min/max and shift the spine)
    val pattern = (1 to 24).toSeq // mean 12.5
    val out = Seasonal.decomposeHourlyCounts(series(
        Seq.fill(4)(pattern).flatten)) // 4 full days
      .collect()
    val interior = out.filter(r => !r.isNullAt(3))
    assert(interior.length == 96 - 24) // 12 null slots each edge
    // MA of an exact period = the period mean, at every interior t
    interior.foreach(r => assert(r.getDouble(3) == 12.5))
    // residual is identically 0.0 — not "small": every occurrence of a
    // slot has the same detrended value, so mean == value exactly
    interior.foreach(r => assert(r.getDouble(5) == 0.0))
  }

  test("linear ramp: trend follows the ramp, seasonal and resid vanish") {
    // x_t = t+1 for 50 hours (≥ 1 everywhere, see the bounds note
    // above); centered MA of a linear series = the series
    val out = Seasonal.decomposeHourlyCounts(series((1 to 50).toSeq))
      .collect().filter(r => !r.isNullAt(3))
    assert(out.length == 50 - 24)
    out.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble) // trend == x
      assert(r.getDouble(5) == 0.0)                   // resid exactly 0
    }
  }

  test("missing hours zero-fill onto the dense spine") {
    // hours 0..9 for type a; type b only at hours 0 and 9 → b gets a
    // 10-slot spine with 8 zero rows
    val a = series(Seq.fill(10)(1), "a")
    val b = series(Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 1), "b")
    val out = Seasonal.decomposeHourlyCounts(a.union(b))
      .filter(col("event_type") === "b").collect()
    assert(out.length == 10)
    assert(out.count(_.getLong(2) == 0L) == 8)
  }

  test("trend/resid null within 12 slots of each edge, defined between") {
    val out = Seasonal.decomposeHourlyCounts(series(Seq.fill(30)(2)))
      .orderBy("hour_epoch").collect()
    assert(out.take(12).forall(_.isNullAt(3)))
    assert(out.takeRight(12).forall(_.isNullAt(3)))
    assert(out.slice(12, 18).forall(r => !r.isNullAt(3)))
  }

  test("deseasonalized anomaly: a planted spike on a noisy cycle is " +
      "flagged; the clean periodic series yields no flags (MAD = 0 " +
      "exclusion)") {
    // noisy-ish cycle: base daily pattern + deterministic jitter so the
    // residual MAD is non-zero, with one 60-count spike at hour 50
    val base = (0 until 24 * 6).map { t =>
      val pat = 4 + (t % 24) % 5
      val jitter = (t * 7) % 3 // 0,1,2 repeating co-prime to 24
      if (t == 50) 60 else pat + jitter
    }
    val flagged = Outliers.madOutliers(
        Seasonal.decomposeHourlyCounts(series(base))
          .filter(col("resid").isNotNull),
        "event_type", "hour_epoch", "resid", threshold = 3.0)
      .collect().map(r => (r.getLong(1) - 1704067200L) / 3600L)
    assert(flagged.contains(50L), s"spike hour missing from $flagged")
    // clean cycle: residuals identically 0 -> MAD = 0 -> no flags, by
    // the documented Iglewicz-Hoaglin exclusion
    val clean = Outliers.madOutliers(
        Seasonal.decomposeHourlyCounts(series(
            Seq.fill(4)((1 to 24).toSeq).flatten))
          .filter(col("resid").isNotNull),
        "event_type", "hour_epoch", "resid", threshold = 3.0)
      .count()
    assert(clean == 0L)
  }

  test("contract entry shape at sf0.001: dense grid, round-trip columns") {
    val out = Seasonal.q103Seasonal(spark, sf0001)
    val grid = out.groupBy("event_type").count()
      .select("count").as[Long].collect().toSet
    assert(grid.size == 1) // every type has the same (global) spine
    assert(out.columns.toSeq ==
      Seq("event_type", "hour_epoch", "n", "trend", "seasonal", "resid"))
  }
}
