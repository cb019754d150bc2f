package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series Holt linear-trend exponential smoothing + h-step
  * forecast (Holt 1957 / Hyndman & Athanasopoulos, "Forecasting:
  * Principles and Practice" §8.2) — the missing member of the
  * time-series family (gap-fill, TWA, OLS trend, retention, sessions,
  * hopping windows all exist; this adds the forward-looking one):
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   ŷ_{n+h} = l_n + h·b_n
  *
  * init l_1 = y_1, b_1 = y_2 − y_1 (the standard two-point start).
  *
  * Scale shape: the recurrence is inherently sequential PER SERIES,
  * so the corpus is first collapsed to (series, week, exact-cents
  * sum) by one map-side-combined aggregate — corpus-sized work, one
  * scan — and the recurrence then runs inside `mapGroups` over the
  * AGGREGATED series only (#weeks rows per key — the BinPack
  * precedent for bounded per-group sequential work; a series must
  * fit in one task's memory, which a weekly/hourly roll-up of even a
  * century does).
  *
  * Bit-replicability: weekly sums are exact cents (BIGINT), y =
  * cents/100.0, and both engines run the IDENTICAL recurrence tree —
  * DuckDB via a recursive CTE whose arithmetic is written with the
  * same literals and parenthesization (the complements are
  * computed as `1.0 − α` / `1.0 − β` on BOTH sides — `1.0 − 0.3` is
  * NOT the double `0.7`, so the oracle spells the subtraction out
  * rather than a collapsed literal). Outputs round 4.
  */
object Forecast {

  /** Per-series Holt fit over (keyCol, ordered xCol, exact `yCents`):
    * (key, n_points, level, trend, f1, f4) — level/trend in value
    * units, f_h = level + h·trend; series with < 2 points are
    * dropped (no slope from one observation — documented). */
  def holt(series: DataFrame, keyCol: String, xCol: String,
      alpha: Double = 0.5, beta: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"smoothing parameters must be in (0,1): alpha=$alpha beta=$beta")
    val ca = alpha; val cca = 1.0 - alpha // complements fixed HERE,
    val cb = beta; val ccb = 1.0 - beta   // mirrored as oracle literals
    val s = series.sparkSession
    import s.implicits._
    val rows = series
      .select(col(keyCol).cast("string"), col(xCol).cast("long"),
        col("y_cents").cast("long"))
      // null rows drop BEFORE the typed encoder (r18 review): a null
      // x/y would die in the non-nullable tuple field with no row
      // context, and a null KEY would emit a series the oracle's
      // equi-joins silently drop — a null observation carries nothing
      // the recurrence can use
      .na.drop()
      .as[(String, Long, Long)]
    rows.groupByKey(_._1)
      .mapGroups { (k, it) =>
        val pts = it.toArray.sortBy(_._2)
        if (pts.length < 2) (k, pts.length, Double.NaN, Double.NaN)
        else {
          var l = pts(0)._3 / 100.0
          var b = pts(1)._3 / 100.0 - l
          var t = 1
          while (t < pts.length) {
            val y = pts(t)._3 / 100.0
            val lNew = ca * y + cca * (l + b)
            b = cb * (lNew - l) + ccb * b
            l = lNew
            t += 1
          }
          (k, pts.length, l, b)
        }
      }
      .toDF(keyCol, "n_points", "l", "b")
      .filter(col("n_points") >= 2)
      .select(col(keyCol), col("n_points"),
        round(col("l"), 4).as("level"),
        round(col("b"), 4).as("trend"),
        round(col("l") + col("b"), 4).as("f1"),
        round(col("l") + lit(4.0) * col("b"), 4).as("f4"))
      .orderBy(keyCol)
  }

  /** Driver entry: weekly revenue per event type, smoothed and
    * forecast 1 and 4 weeks out. Week bucketing shares q95's
    * floor-division convention. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_holt" -> ((s: SparkSession, d: String) => {
      val weekly = graft.Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          expr("CAST(floor(unix_timestamp(ts) / 604800.0) AS BIGINT)")
            .as("w"))
        .agg(sum(Stores.cents(col("value"))
          .cast("long")).as("y_cents"))
      holt(weekly, "event_type", "w")
    }))

  val oracle: Map[String, String] = Map(
    "nq_holt" ->
      """WITH RECURSIVE wk AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS w,
        |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS yc
        |  FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY event_type ORDER BY w) AS t,
        |    CAST(yc AS DOUBLE) / 100.0 AS y
        |  FROM wk),
        |n AS (SELECT event_type, max(t) AS n_points FROM ser
        |      GROUP BY event_type),
        |hw AS (
        |  SELECT s1.event_type, 2 AS t,
        |    0.5 * s2.y + (1.0 - 0.5) * (s1.y + (s2.y - s1.y)) AS l,
        |    0.3 * ((0.5 * s2.y + (1.0 - 0.5) * (s1.y + (s2.y - s1.y))) - s1.y)
        |      + (1.0 - 0.3) * (s2.y - s1.y) AS b
        |  FROM ser s1 JOIN ser s2
        |    ON s1.event_type = s2.event_type AND s1.t = 1 AND s2.t = 2
        |  UNION ALL
        |  SELECT hw.event_type, hw.t + 1,
        |    0.5 * s.y + (1.0 - 0.5) * (hw.l + hw.b),
        |    0.3 * ((0.5 * s.y + (1.0 - 0.5) * (hw.l + hw.b)) - hw.l)
        |      + (1.0 - 0.3) * hw.b
        |  FROM hw JOIN ser s
        |    ON s.event_type = hw.event_type AND s.t = hw.t + 1)
        |SELECT hw.event_type, n.n_points,
        |  round(hw.l, 4) AS level, round(hw.b, 4) AS trend,
        |  round(hw.l + hw.b, 4) AS f1,
        |  round(hw.l + 4.0 * hw.b, 4) AS f4
        |FROM hw JOIN n USING (event_type)
        |WHERE hw.t = n.n_points AND n.n_points >= 2
        |ORDER BY hw.event_type""".stripMargin)
}
