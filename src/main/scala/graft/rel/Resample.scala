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
        (unix_timestamp(col("ts")).divide(bucketSec)).cast("long")
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
            expr("(prev.v6 * (next.bidx - bidx) + next.v6 * " +
              "(bidx - prev.bidx)) div (next.bidx - prev.bidx)")))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_gapfill" -> ((s: SparkSession, d: String) => q84GapFill(s, d)))

  val oracle: Map[String, String] = Map(
    "q84_gapfill" -> q84Sql(900L))
}
