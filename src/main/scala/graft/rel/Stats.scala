package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Pearson χ² independence analysis — the contingency-table statistic
  * behind categorical feature screening (the relational cousin of the
  * pipeline's mutual-information selector, ml.MiSelector): for two
  * categorical columns, every cell's observed count, its expected
  * count under independence (rowTotal·colTotal/N), and its χ²
  * contribution (obs − exp)²/exp. The judge-facing statistic is the
  * contribution sum; emitting per-cell rows keeps the whole
  * computation oracle-checkable and makes the output useful (WHICH
  * cells deviate, not just that the pair is dependent).
  *
  * Scale shape: ONE map-side-combined count aggregate reduces the
  * corpus to ≤ |A|·|B| cells; the marginals are two more aggregates
  * OVER THE CELLS (cells-sized input, not a second corpus scan) and
  * ride back in as broadcast joins. Every float is a fixed expression
  * tree over exact longs — no rounding needed anywhere, the oracle is
  * bit-exact.
  */
object Stats {

  /** Per-cell χ² decomposition of `df` over two categorical columns.
    * The grid is DENSE: a (row, column) pair the data never produced
    * is still a cell of the test — obs 0, expected rt·ct/N, and its
    * full contribution (dropping structural zeros would understate
    * χ² exactly where the dependence is strongest). Dense-spine
    * discipline as in Resample: the cross join is of the DISTINCT
    * category lists, output-proportional, never data-sized. */
  def chi2Cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // incomplete observations are dropped up front (standard
    // contingency practice) — a null category would otherwise be
    // counted into N by the aggregate but silently lost by the
    // null-unsafe grid and marginal joins, skewing every expected count
    val clean = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val seen = clean.groupBy(aCol, bCol).agg(count(lit(1)).as("obs"))
    val rowTot = seen.groupBy(aCol).agg(sum("obs").as("row_tot"))
    val colTot = seen.groupBy(bCol).agg(sum("obs").as("col_tot"))
    val n = seen.agg(sum("obs").as("n_total"))
    val cells = rowTot.select(aCol).crossJoin(broadcast(colTot.select(bCol)))
      .join(seen, Seq(aCol, bCol), "left")
      .select(col(aCol), col(bCol), coalesce(col("obs"), lit(0L)).as("obs"))
    val e = col("row_tot").cast("double") * col("col_tot").cast("double") /
      col("n_total").cast("double")
    val od = col("obs").cast("double")
    cells.join(broadcast(rowTot), aCol)
      .join(broadcast(colTot), bCol)
      .crossJoin(broadcast(n))
      .select(col(aCol), col(bCol), col("obs"),
        e.as("expected"),
        ((od - e) * (od - e) / e).as("contrib"))
      .orderBy(aCol, bCol)
  }

  /** Driver entry: is event type independent of hour of day? */
  def q92Chi2Cells(s: SparkSession, d: String): DataFrame =
    chi2Cells(
      events(s, d).select(col("event_type"),
        hour(col("ts")).cast("long").as("hr")),
      "event_type", "hr")

  /** Hopping (sliding) window aggregate — Spark's
    * `window(ts, size, slide)` generator: each event lands in
    * size/slide overlapping windows (here 1 h windows every 15 min →
    * 4), the streaming-analytics smoothing of q15's tumbling hourly
    * counts. Window starts are epoch-aligned to the slide, emitted as
    * epoch SECONDS (timestamp formatting is not canonical across
    * engines; the integer is). Value sums ride as exact cents.
    *
    * Scale shape: the ×(size/slide) row multiplication happens
    * map-side and immediately partial-aggregates to the window-count
    * — the exchange carries windows × types, not events × 4. */
  def q94HoppingWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        window(col("ts"), "1 hour", "15 minutes").as("w"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("vc"))
      .groupBy(col("event_type"),
        unix_timestamp(col("w.start")).as("win_start_sec"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("vc")).as("sum_cents"))
      .orderBy("event_type", "win_start_sec")

  val q94Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
      |  FROM events),
      |hops AS (
      |  SELECT event_type, vc,
      |    (es // 900) * 900 - 900 * i AS win_start_sec
      |  FROM e, (SELECT unnest(range(0, 4)) AS i))
      |SELECT event_type, win_start_sec,
      |  count(*) AS n_events, sum(vc) AS sum_cents
      |FROM hops
      |GROUP BY event_type, win_start_sec
      |ORDER BY event_type, win_start_sec""".stripMargin

  /** Weekly retention cohorts — the product-analytics triangle: users
    * grouped by first-active week, activity counted per later week as
    * an offset from the cohort week. All-integer epoch-week
    * arithmetic.
    *
    * Scale shape: first-event week is ONE min-aggregate on user_id
    * (the only user-keyed exchange); the cohort matrix re-aggregates
    * the per-(user, week) distinct relation — cells are
    * cohorts × offsets, tiny. */
  def q95RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      expr("unix_timestamp(ts) div 604800").as("wk"))
    val userWeeks = ev.distinct()
    val cohort = userWeeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    userWeeks.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_wk", "wk_offset")
  }

  val q95Sql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      |  FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY 1)
      |SELECT c.cohort_wk, uw.wk - c.cohort_wk AS wk_offset,
      |  count(DISTINCT uw.user_id) AS n_users
      |FROM uw JOIN c ON uw.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_wk, wk_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q92_chi2_cells" -> (q92Chi2Cells _),
    "q94_hopping_windows" -> (q94HoppingWindows _),
    "q95_retention_cohorts" -> (q95RetentionCohorts _))

  val oracle: Map[String, String] = Map(
    "q94_hopping_windows" -> q94Sql,
    "q95_retention_cohorts" -> q95Sql,
    "q92_chi2_cells" ->
      """WITH seen AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |    count(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(obs) AS row_tot FROM seen
        |       GROUP BY 1),
        |ct AS (SELECT hr, sum(obs) AS col_tot FROM seen GROUP BY 1),
        |n AS (SELECT sum(obs) AS n_total FROM seen),
        |cells AS (
        |  SELECT rt.event_type, ct.hr, coalesce(seen.obs, 0) AS obs
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN seen ON rt.event_type = seen.event_type
        |    AND ct.hr = seen.hr)
        |SELECT c.event_type, c.hr, c.obs,
        |  CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
        |    / CAST(n_total AS DOUBLE) AS expected,
        |  (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE)
        |     * CAST(col_tot AS DOUBLE) / CAST(n_total AS DOUBLE))
        |  * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE)
        |     * CAST(col_tot AS DOUBLE) / CAST(n_total AS DOUBLE))
        |  / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
        |     / CAST(n_total AS DOUBLE)) AS contrib
        |FROM cells c
        |JOIN rt ON c.event_type = rt.event_type
        |JOIN ct ON c.hr = ct.hr
        |CROSS JOIN n
        |ORDER BY c.event_type, c.hr""".stripMargin)
}
