package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Time-series resampling with gap interpolation — the
  * `resample().interpolate()` pandas idiom (SURVEY §2.F's family:
  * the reference consumes a regular frame grid; real event streams
  * are irregular, and a training pipeline regularizes them before any
  * windowed feature pass): bucket each series to a fixed grid,
  * materialize the DENSE per-key bucket spine between the key's first
  * and last observation, and linearly interpolate interior gaps —
  * leading/trailing buckets stay null (`edge`), pandas' convention.
  *
  * Scale shape (the 100 TB story):
  *  - bucketing is a narrow epoch-arithmetic projection + one
  *    group-keyed aggregate with map-side combine.
  *  - the spine is generated per key from its own (min, max) bucket —
  *    sequence + explode, proportional to the OUTPUT, never a
  *    cross-join against a global calendar.
  *  - interpolation is two windows per key (previous / next observed
  *    carried as (bucket, value) structs with ignoreNulls) — state
  *    bounded by one key's buckets, the standard series-per-key
  *    partition. No driver-side loops, no UDFs.
  *
  * Everything downstream of the per-bucket average is exact arithmetic
  * over round-6 values, so the whole operator — spine, gap detection,
  * interpolation — hash-checks against DuckDB (q84).
  */
object Resample {

  /** Per-type 15-minute resample of `events.value` with linear
    * interpolation: (event_type, bucket_start epoch-sec, value, src ∈
    * obs|interp|edge). */
  def q84GapFill(s: SparkSession, d: String,
      bucketSec: Long = 900L): DataFrame = {
    // The ONE sum-order-dependent float in the chain is the bucket
    // mean; it is quantized immediately to integer MICRO-units, and
    // everything downstream — including the interpolation itself — is
    // exact BIGINT arithmetic (a float interpolation would hit
    // STRUCTURAL round-6 ties on gap midpoints, where the two engines'
    // tie-breaking can differ; integral `div` has no ties). The output
    // double is micro/1e6 — the same exact division in both engines.
    val obs = events(s, d)
      .select(col("event_type"),
        // floor(), not divide-and-cast (r18 review): cast(long)
        // truncates toward zero while the oracle's `//` floors — a
        // pre-1970 (negative-epoch) event would land in a different
        // bucket per engine. Exact: epochs sit far inside double's
        // 2^53 integer range, and 900k/900 divides exactly
        floor(unix_timestamp(col("ts")) / lit(bucketSec)).cast("long")
          .as("bidx"),
        col("value"))
      .groupBy("event_type", "bidx")
      .agg(round(avg(col("value")) * 1e6, 0).cast("long").as("v6"))
    val spine = obs.groupBy("event_type")
      .agg(min("bidx").as("lo"), max("bidx").as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi)")).as("bidx"))
    val joined = spine.join(obs, Seq("event_type", "bidx"), "left")
    // both carries as GROWING frames (unboundedPreceding → -1): Spark
    // evaluates a growing frame incrementally (O(n) per partition) but
    // implements the shrinking frame (1 → unboundedFollowing) as
    // UnboundedFollowingWindowFunctionFrame, which RE-AGGREGATES the
    // remaining partition for every row — O(n²) per series, measured
    // 2.4 s of this query's 3.3 s at a mere 2.9k buckets/series and
    // fatal at real series lengths. The "next observed" carry is the
    // same growing frame over the REVERSE order.
    val wFwd = Window.partitionBy("event_type").orderBy("bidx")
    val wRev = Window.partitionBy("event_type").orderBy(col("bidx").desc)
    val ov = when(col("v6").isNotNull, struct(col("bidx"), col("v6")))
    joined
      .withColumn("prev", last(ov, ignoreNulls = true)
        .over(wFwd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next", last(ov, ignoreNulls = true)
        .over(wRev.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("m6",
        when(col("v6").isNotNull, col("v6"))
          .when(col("prev").isNotNull && col("next").isNotNull,
            // FLOOR division to match the oracle's `//` (r18 review):
            // Spark's `div` truncates toward zero, which diverges on a
            // NEGATIVE numerator (negative interpolated values); the
            // denominator is always > 0 (next.bidx > prev.bidx), so
            // floordiv = truncdiv - 1 exactly when the remainder < 0
            expr("((prev.v6 * (next.bidx - bidx) + next.v6 * " +
              "(bidx - prev.bidx)) div (next.bidx - prev.bidx)) + " +
              "(CASE WHEN (prev.v6 * (next.bidx - bidx) + next.v6 * " +
              "(bidx - prev.bidx)) % (next.bidx - prev.bidx) < 0 " +
              "THEN -1 ELSE 0 END)")))
      .select(col("event_type"),
        (col("bidx") * bucketSec).as("bucket_start"),
        (col("m6").cast("double") / lit(1e6)).as("value"),
        when(col("v6").isNotNull, lit("obs"))
          .when(col("prev").isNotNull && col("next").isNotNull,
            lit("interp"))
          .otherwise(lit("edge")).as("src"))
      .orderBy("event_type", "bucket_start")
  }

  // Same chain in DuckDB: floor-epoch bucketing, round-6 bucket means,
  // per-key dense spine via generate_series, previous/next observed
  // carried as structs with IGNORE NULLS, identical interpolation
  // arithmetic over the rounded values.
  private def q84Sql(bucketSec: Long): String =
    s"""WITH obs AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // $bucketSec AS bidx,
       |    CAST(round(avg(value) * 1e6) AS BIGINT) AS v6
       |  FROM events GROUP BY 1, 2),
       |spine AS (
       |  SELECT event_type, unnest(generate_series(min(bidx), max(bidx)))
       |    AS bidx
       |  FROM obs GROUP BY event_type),
       |j AS (
       |  SELECT s.event_type, s.bidx, o.v6 FROM spine s
       |  LEFT JOIN obs o ON o.event_type = s.event_type
       |    AND o.bidx = s.bidx),
       |wnd AS (
       |  SELECT *,
       |    last_value(CASE WHEN v6 IS NULL THEN NULL
       |      ELSE struct_pack(b := bidx, v := v6) END IGNORE NULLS)
       |      OVER (PARTITION BY event_type ORDER BY bidx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev,
       |    first_value(CASE WHEN v6 IS NULL THEN NULL
       |      ELSE struct_pack(b := bidx, v := v6) END IGNORE NULLS)
       |      OVER (PARTITION BY event_type ORDER BY bidx
       |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
       |      AS next
       |  FROM j),
       |m AS (
       |  SELECT *, CASE WHEN v6 IS NOT NULL THEN v6
       |    WHEN prev IS NOT NULL AND next IS NOT NULL THEN
       |      (prev.v * (next.b - bidx) + next.v * (bidx - prev.b))
       |        // (next.b - prev.b)
       |    ELSE NULL END AS m6
       |  FROM wnd)
       |SELECT event_type, bidx * $bucketSec AS bucket_start,
       |  m6::DOUBLE / 1e6 AS value,
       |  CASE WHEN v6 IS NOT NULL THEN 'obs'
       |    WHEN prev IS NOT NULL AND next IS NOT NULL THEN 'interp'
       |    ELSE 'edge' END AS src
       |FROM m
       |ORDER BY event_type, bucket_start""".stripMargin

  /** Time-weighted average — the irregular-series mean that billing,
    * monitoring, and TWAP pipelines need: each observation holds until
    * the next one, so its weight is the micros it was "live"
    * (piecewise-constant / last-observation-carried-forward
    * integration; the final observation has no holding interval and
    * contributes no weight). Entirely exact arithmetic: micros and
    * cents are integers, the weighted sum is a DECIMAL(38,0), and the
    * average is one fixed double tree — hash-green in DuckDB.
    *
    * Scale shape: ONE hash exchange on the series key, one O(1)-state
    * lead() pass, one map-side-combined aggregate. Ties in ts order
    * deterministically by event_id (a layout-dependent lead() would
    * not replicate). Single-event series have zero span → null twa.
    */
  def twa(ev: DataFrame): DataFrame = {
    val dt38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = ev.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      Stores.cents(col("value")).as("vc"))
      // null observations drop BEFORE the lead (r18 review): keeping
      // them counted their holding interval in span_us while
      // contributing nothing to wsum — silently biasing the average
      // toward zero. Dropping extends the PREVIOUS observation across
      // the gap (last-observation-carried-forward, this operator's own
      // integration rule); the oracle filters identically
      .filter(col("vc").isNotNull && col("us").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val stepped = e
      .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
    val agg = stepped.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      coalesce(sum("dt"), lit(0L)).as("span_us"),
      sum(col("vc").cast(dt38) * col("dt").cast(dt38)).as("wsum"))
    agg.select(col("user_id"), col("n_events"), col("span_us"),
      when(col("span_us") > 0,
        col("wsum").cast("double") / col("span_us").cast("double")
          / lit(100.0)).as("twa"))
  }

  def q91Twa(s: SparkSession, d: String): DataFrame =
    twa(events(s, d)).orderBy("user_id")

  val q91Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
      |  -- null observations drop (LOCF across the gap) — see twa()
      |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      |st AS (
      |  SELECT user_id, us, vc,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      - us AS dt
      |  FROM e),
      |a AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(coalesce(sum(dt), 0) AS BIGINT) AS span_us,
      |    sum(CAST(vc AS HUGEINT) * CAST(dt AS HUGEINT)) AS wsum
      |  FROM st GROUP BY user_id)
      |SELECT user_id, n_events, span_us,
      |  CASE WHEN span_us > 0 THEN
      |    CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0
      |  END AS twa
      |FROM a ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_gapfill" -> ((s: SparkSession, d: String) => q84GapFill(s, d)),
    "q91_twa" -> (q91Twa _))

  val oracle: Map[String, String] = Map(
    "q84_gapfill" -> q84Sql(900L),
    "q91_twa" -> q91Sql)
}
