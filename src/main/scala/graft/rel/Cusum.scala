package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-series CUSUM changepoint detection (Page 1954, "Continuous
  * inspection schemes", Biometrika — the original sequential
  * changepoint test; Montgomery, "Statistical Quality Control", ch. 9
  * for the two-sided tabular form used here):
  *
  *   s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − kσ))
  *   s⁻_t = max(0, s⁻_{t−1} + (μ − x_t − kσ))      alarm when s > hσ
  *
  * with μ, σ the series' own mean and population std, slack k = 0.5
  * and threshold h = 4 (the textbook defaults). The monitoring family's
  * missing member: PSI drift (rel.Drift) scores distribution shift
  * between two snapshots, the MAD screen (q104) flags single outlier
  * points, seasonal decomposition explains the periodic part — CUSUM
  * detects a SUSTAINED small shift in level (a pipeline's silent
  * volume regression) that no single point makes anomalous.
  *
  * Scale shape (the Holt/`Forecast` precedent verbatim): one map-side-
  * combined aggregate collapses the corpus to (series, hour, exact
  * cents) — the only corpus-sized work — and the inherently-sequential
  * recurrence runs inside `mapGroups` over the AGGREGATED series
  * (#hours rows per key; bounded per-group sequential work, the
  * BinPack shard contract).
  *
  * Bit-replicability: hourly sums are exact cents (integers, summed
  * exactly on both engines and < 2⁵³ so the double cast is lossless);
  * μ, σ, and the recurrence are ONE fixed double tree in CENTS
  * (μc = cs/n, varc = (css − cs·cs/n)/n, slack = 0.5·σc, step =
  * x − μc − slack) replicated verbatim in the oracle's recursive CTE —
  * identical IEEE ops, so even the threshold comparisons agree
  * bit-for-bit (the q92/q93 fixed-tree convention). Display columns
  * divide by 100 and round 4 at the END only.
  */
object Cusum {

  /** Per-series two-sided CUSUM over (keyCol, ordered xCol, exact
    * `y_cents`): one row per series —
    * (key, n_points, mean_val, std_val, max_spos, max_sneg, n_alarms,
    * first_alarm_x) — where an alarm is any t with s⁺ or s⁻ above
    * h·σ, n_alarms counts alarmed POINTS, and first_alarm_x is the
    * first alarmed x (null when the series never alarms). A constant
    * series (σ = 0) never alarms: every step is x − μ = 0. */
  def cusum(series: DataFrame, keyCol: String, xCol: String,
      k: Double = 0.5, h: Double = 4.0): DataFrame = {
    require(k >= 0 && h > 0, s"need k >= 0 and h > 0, got k=$k h=$h")
    val s = series.sparkSession
    import s.implicits._
    val rows = series
      .select(col(keyCol).cast("string"), col(xCol).cast("long"),
        col("y_cents").cast("long"))
      // null rows drop BEFORE the typed encoder — see Forecast.holt
      .na.drop()
      .as[(String, Long, Long)]
    rows.groupByKey(_._1)
      .mapGroups { (key, it) =>
        val pts = it.toArray.sortBy(_._2)
        val n = pts.length
        var cs = 0L; var css = 0L
        // checked accumulation: an hourly sum ≥ ~3.04e9 cents overflows
        // Long on the SQUARE — the oracle's BIGINT multiply raises
        // there too, and unchecked += would silently wrap Spark-side.
        // The css/cs ADDS are stricter than the oracle (DuckDB sums
        // BIGINT into HUGEINT, so only its multiply can raise): inputs
        // whose squares fit but whose SUM exceeds 2^63 make the engine
        // refuse loudly where the oracle would continue — the right
        // divergence direction for a monitor, and far outside the
        // documented < 2^53 envelope in any case
        pts.foreach { p =>
          cs = Math.addExact(cs, p._3)
          css = Math.addExact(css, Math.multiplyExact(p._3, p._3))
        }
        // the fixed tree, in CENTS (mirrored literally in the oracle)
        val nd = n.toDouble
        val csd = cs.toDouble
        val cssd = css.toDouble
        val muc = csd / nd
        // greatest-0 guard: a constant series' variance is a tiny ±ulp
        // residual; sqrt of the negative side would be NaN here and an
        // ERROR in DuckDB — clamp identically on both sides
        val varc = (cssd - csd * csd / nd) / nd
        val sigc = math.sqrt(math.max(0.0, varc))
        // the ONE shared recurrence (see foldAlarms) — the report and
        // the monitors cannot drift apart structurally
        val summary = foldAlarms(key, pts.map(p => (p._2, p._3)),
          muc, sigc, k, h, (0.0, 0.0))._3
        (key, n.toLong, muc, sigc, summary.maxPos, summary.maxNeg,
          summary.nAlarms, summary.firstAlarmX)
      }
      .toDF(keyCol, "n_points", "muc", "sigc", "maxp", "maxn",
        "n_alarms", "first_alarm_x")
      .select(col(keyCol), col("n_points"),
        round(col("muc") / 100.0, 4).as("mean_val"),
        round(col("sigc") / 100.0, 4).as("std_val"),
        round(col("maxp") / 100.0, 4).as("max_spos"),
        round(col("maxn") / 100.0, 4).as("max_sneg"),
        col("n_alarms"), col("first_alarm_x"))
      .orderBy(keyCol)
  }

  /** One series' fold summary: running maxima of the two sides, the
    * alarmed-point count, and the first alarmed x. */
  private final case class FoldSummary(maxPos: Double, maxNeg: Double,
      nAlarms: Long, firstAlarmX: Option[Long])

  /** The shared recurrence fold: alarms emitted per point, carry-in/
    * carry-out state, and the batch summary — ONE implementation
    * behind [[cusum]]'s report AND the batch/streaming monitors (r18
    * review: the report previously duplicated the recurrence inline,
    * so an edit to the alarm test in one copy would silently de-sync
    * the spec-pinned 'alarms ≡ one batch' equivalence). */
  private def foldAlarms(key: String, pts: Array[(Long, Long)],
      muc: Double, sigc: Double, k: Double, h: Double,
      init: (Double, Double))
      : (Array[(String, Long, Double, Double)], (Double, Double),
         FoldSummary) = {
    val slack = k * sigc
    val thresh = h * sigc
    var sp = init._1; var sn = init._2
    var maxPos = 0.0; var maxNeg = 0.0
    var nAlarms = 0L
    var firstAlarm: java.lang.Long = null
    val out = pts.flatMap { p =>
      val x = p._2.toDouble
      sp = math.max(0.0, sp + (x - muc - slack))
      sn = math.max(0.0, sn + (muc - x - slack))
      if (sp > maxPos) maxPos = sp
      if (sn > maxNeg) maxNeg = sn
      if (sp > thresh || sn > thresh) {
        nAlarms += 1
        if (firstAlarm == null) firstAlarm = p._1
        Some((key, p._1, sp, sn))
      } else None
    }
    (out, (sp, sn), FoldSummary(maxPos, maxNeg, nAlarms,
      Option(firstAlarm).map(_.longValue)))
  }

  /** Batch alarm rows against a FROZEN baseline (keyCol → (μc, σc) in
    * cents — fitted offline, e.g. from [[cusum]]'s mean/std over a
    * reference window): (key, x, spos, sneg) for every alarmed point.
    * Keys without a baseline emit nothing (monitoring an unmodeled
    * stream is a configuration decision, not a silent default). */
  def cusumAlarms(series: DataFrame, keyCol: String, xCol: String,
      baseline: Map[String, (Double, Double)],
      k: Double = 0.5, h: Double = 4.0): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(baseline)
    series
      .select(col(keyCol).cast("string"), col(xCol).cast("long"),
        col("y_cents").cast("long"))
      .na.drop() // see Forecast.holt
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        bc.value.get(key) match {
          case None => Iterator.empty
          case Some((muc, sigc)) =>
            foldAlarms(key, it.toArray.sortBy(_._2).map(p => (p._2, p._3)),
              muc, sigc, k, h, (0.0, 0.0))._1.iterator
        }
      }
      .toDF(keyCol, xCol, "spos", "sneg")
      .orderBy(keyCol, xCol)
  }

  /** Streaming monitor — the control chart's deploy shape: per-key
    * CUSUM state carried ACROSS micro-batches via
    * flatMapGroupsWithState, alarms emitted as they occur. The
    * baseline is FROZEN (the streaming family's frozen-LM /
    * frozen-threshold convention: a monitor that refits itself on the
    * data it is judging isn't a monitor). Within a micro-batch rows
    * fold in xCol order; the recurrence is order-sensitive, so
    * correctness across batches requires per-key in-order delivery
    * (the ingest-gate family's documented delivery contract — a
    * watermark-bounded reorder buffer is the relaxation, not built
    * here). Spec pins: split delivery ≡ one batch ≡ [[cusumAlarms]]. */
  def cusumAlarmsStream(stream: DataFrame, keyCol: String, xCol: String,
      baseline: Map[String, (Double, Double)],
      k: Double = 0.5, h: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val s = stream.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(baseline)
    val kk = k; val hh = h
    stream
      .select(col(keyCol).cast("string"), col(xCol).cast("long"),
        col("y_cents").cast("long"))
      .na.drop() // see Forecast.holt
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Double),
        (String, Long, Double, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key, it, state) =>
          bc.value.get(key) match {
            case None => Iterator.empty
            case Some((muc, sigc)) =>
              val (out, next, _) = foldAlarms(key,
                it.toArray.sortBy(_._2).map(p => (p._2, p._3)),
                muc, sigc, kk, hh,
                state.getOption.getOrElse((0.0, 0.0)))
              state.update(next)
              out.iterator
          }
      }
      .toDF(keyCol, xCol, "spos", "sneg")
  }

  // ---------------------------------------------------------------- q110
  /** Driver entry: hourly revenue per event type, CUSUM at the
    * textbook k=0.5 / h=4. Hour bucketing and cents quantization share
    * the q103/nq_holt conventions. */
  def q110Cusum(s: SparkSession, d: String): DataFrame = {
    val hourly = graft.Tables.events(s, d)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 3600.0) AS BIGINT)")
          .as("hr"))
      .agg(sum(Stores.cents(col("value"))
        .cast("long")).as("y_cents"))
    cusum(hourly, "event_type", "hr")
  }

  // Recursive-CTE replay of the identical recurrence (the nq_holt
  // oracle discipline: complements and factors spelled as literals,
  // never collapsed; all comparisons on the shared bit-exact tree).
  private[rel] val q110Sql: String =
    """WITH RECURSIVE hrly AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
      |    CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS yc
      |  FROM events
      |  WHERE value IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |ser AS (
      |  SELECT event_type,
      |    row_number() OVER (PARTITION BY event_type ORDER BY hr) AS t,
      |    hr, CAST(yc AS DOUBLE) AS x
      |  FROM hrly),
      |mom AS (
      |  SELECT event_type,
      |    CAST(max(t) AS BIGINT) AS n_points,
      |    CAST(sum(CAST(x AS BIGINT)) AS DOUBLE) AS csd,
      |    CAST(sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS DOUBLE)
      |      AS cssd,
      |    CAST(max(t) AS DOUBLE) AS nd
      |  FROM ser GROUP BY event_type),
      |par AS (
      |  SELECT event_type, n_points,
      |    csd / nd AS muc,
      |    sqrt(greatest(0.0, (cssd - csd * csd / nd) / nd)) AS sigc
      |  FROM mom),
      |cu AS (
      |  SELECT s.event_type, s.t, s.hr,
      |    greatest(0.0, 0.0 + (s.x - p.muc - 0.5 * p.sigc)) AS spos,
      |    greatest(0.0, 0.0 + (p.muc - s.x - 0.5 * p.sigc)) AS sneg
      |  FROM ser s JOIN par p USING (event_type) WHERE s.t = 1
      |  UNION ALL
      |  SELECT s.event_type, s.t, s.hr,
      |    greatest(0.0, cu.spos + (s.x - p.muc - 0.5 * p.sigc)),
      |    greatest(0.0, cu.sneg + (p.muc - s.x - 0.5 * p.sigc))
      |  FROM cu
      |  JOIN ser s ON s.event_type = cu.event_type AND s.t = cu.t + 1
      |  JOIN par p ON p.event_type = cu.event_type),
      |alarm AS (
      |  SELECT c.event_type,
      |    max(c.spos) AS maxp, max(c.sneg) AS maxn,
      |    CAST(count(CASE WHEN c.spos > 4.0 * p.sigc
      |                      OR c.sneg > 4.0 * p.sigc THEN 1 END)
      |      AS BIGINT) AS n_alarms,
      |    min(CASE WHEN c.spos > 4.0 * p.sigc
      |               OR c.sneg > 4.0 * p.sigc THEN c.hr END)
      |      AS first_alarm_x
      |  FROM cu c JOIN par p USING (event_type)
      |  GROUP BY c.event_type)
      |SELECT p.event_type, p.n_points,
      |  round(p.muc / 100.0, 4) AS mean_val,
      |  round(p.sigc / 100.0, 4) AS std_val,
      |  round(a.maxp / 100.0, 4) AS max_spos,
      |  round(a.maxn / 100.0, 4) AS max_sneg,
      |  a.n_alarms, a.first_alarm_x
      |FROM par p JOIN alarm a USING (event_type)
      |ORDER BY p.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_cusum" -> (q110Cusum _))

  val oracle: Map[String, String] = Map(
    "q110_cusum" -> q110Sql)
}
