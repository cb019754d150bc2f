package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection — the median/MAD modified
  * z-score (Iglewicz & Hoaglin 1993, "How to Detect and Handle
  * Outliers": M = 0.6745·(x − median)/MAD, flag |M| > 3.5): the
  * production data-quality screen that mean/stddev z-scores can't be
  * (one wild value drags the mean AND inflates the stddev toward
  * hiding itself; the breakdown point of median/MAD is 50%). Joins
  * the quality family: nq_expectations gates on declared rules, this
  * finds the rows no rule anticipated.
  *
  * Exact form (this operator): two percentile passes — per-group
  * median, then median absolute deviation — each an exact
  * interpolating percentile (the q39 convention, Spark `percentile`
  * ≡ DuckDB `quantile_cont`), group medians broadcast back. Exact
  * per-group percentiles sort each group on one reducer — the same
  * documented bound as q39/q77's exact forms; the 100 TB path swaps
  * both passes for the engine's KLL sketch (`kll_sketch` — mergeable
  * map-side partials, no per-group sort) with identical flag
  * semantics at sketch accuracy.
  *
  * The flag compares the ROUNDED score (round 4) so both engines
  * decide from the same quantity; z is one fixed double tree over
  * the interpolated medians.
  */
object Outliers {

  /** Rows whose modified z-score exceeds `threshold`:
    * (groupCol, idCol, value, mz) ordered by (groupCol, idCol).
    * Groups with MAD = 0 (≥ half the values identical) yield no
    * flags — the Iglewicz-Hoaglin convention is to fall back to
    * mean-based deviation; here they are excluded and that exclusion
    * is part of the contract (spec-pinned). */
  def madOutliers(rows: DataFrame, groupCol: String, idCol: String,
      valueCol: String, threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val v = col(valueCol)
    val med = rows.filter(v.isNotNull).groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val mad = rows.filter(v.isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol)
      .agg(expr(s"percentile(abs($valueCol - med), 0.5)").as("mad"))
    val mz = round(lit(0.6745) * (v - col("med")) / col("mad"), 4)
    rows.filter(v.isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .filter(col("mad") > 0.0)
      .withColumn("mz", mz)
      .filter(abs(col("mz")) > threshold)
      .select(col(groupCol), col(idCol), v, col("mz"))
      .orderBy(groupCol, idCol)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_outliers" -> ((s: SparkSession, d: String) =>
      madOutliers(graft.Tables.events(s, d), "event_type", "event_id",
        "value")))

  val oracle: Map[String, String] = Map(
    "nq_outliers" ->
      """WITH e AS (
        |  SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL),
        |med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type,
        |    quantile_cont(abs(e.value - med.med), 0.5) AS mad
        |  FROM e JOIN med USING (event_type)
        |  GROUP BY e.event_type)
        |SELECT e.event_type, e.event_id, e.value,
        |  round(0.6745 * (e.value - med.med) / mad.mad, 4) AS mz
        |FROM e
        |JOIN med USING (event_type)
        |JOIN mad USING (event_type)
        |WHERE mad.mad > 0.0
        |  AND abs(round(0.6745 * (e.value - med.med) / mad.mad, 4)) > 3.5
        |ORDER BY e.event_type, e.event_id""".stripMargin)
}
