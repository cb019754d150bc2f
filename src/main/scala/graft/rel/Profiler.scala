package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Table profiling — pandas `describe()` / DuckDB `SUMMARIZE` as one
  * distributed pass (the reference recomputes exactly this shape
  * eagerly over its whole frame table every run,
  * /root/reference/src/voice_classifier.py:147): one row per column
  * with row/null/distinct counts and numeric min/max/mean, for any
  * input schema by reflection.
  *
  * Scale shape: ONE aggregate job produces every per-column statistic
  * (a single scan, map-side partials for all of them), then the wide
  * result row pivots to per-column rows driver-side via a literal
  * struct array — rows = columns, not data. The exact per-column
  * distinct count is the one statistic whose single-pass form
  * multiplies the scan (Spark plans multi-distinct aggregates with
  * EXPAND: one input row per distinct-column) — honest but heavy at
  * 100 TB, so `profile` takes a flag: exact distinct for the oracle
  * contract (q87), KMV min-k sketches (k-bounded partials, no EXPAND)
  * as the default scale path — the same exact/approx pairing as
  * q11 vs nq_approx_distinct / nq_kmv_distinct.
  *
  * Timestamps profile their counts but not min/max/mean: cross-engine
  * timestamp-to-string formatting is not canonical, and the numeric
  * channel is typed DOUBLE. Means are round-4 like every aggregated
  * double in the contract (q01's convention).
  */
object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  /** Per-column profile of `df`: (col_name, dtype, n_rows, n_null,
    * n_distinct | n_distinct_est, min_num, max_num, avg_num).
    *
    * Exact form: `countDistinct` per column (EXPAND — one input row
    * per distinct column; the oracle contract q87). Approx scale form:
    * a KMV min-k sketch per column over `xxhash64` — k-bounded
    * exchange state, no EXPAND, and 2.7× cheaper than
    * `approx_count_distinct`'s interpreted HLL updates (measured r11:
    * 0.9 s vs 2.4 s for the 11-sketch-only pass at sf0.1 — both run
    * interpreted because imperative aggregates disable whole-stage
    * codegen, but the common KMV row is a cheap reject while HLL pays
    * a register update per row). The estimate is (k−1)/u(h_(k)) (Beyer
    * et al. 2007), the same bit-replicable double chain nq_kmv_distinct
    * hash-checks — which is what lets nq_profile carry a full DuckDB
    * oracle: declarative stats recompute exactly from the raw table,
    * the estimator tail re-runs over the dumped sketches. */
  def profile(df: DataFrame, exactDistinct: Boolean = false,
      k: Int = ApproxK, dumpPath: Option[String] = None): DataFrame = {
    if (!exactDistinct) graft.functions.VecFunctions.register(df.sparkSession)
    val cols = df.schema.fields
    // hash once in a codegen'd projection BEFORE the aggregate: a
    // TypedImperativeAggregate's update eval is interpreted, so its
    // child must be a bound reference, not CASE+xxhash64 per row per
    // column (measured r11: the hoist is the cheap half of the pass).
    // Null-guarded: xxhash64(NULL) is the seed, not NULL — the sketch
    // must see nulls as absent, like count distinct does.
    val hashed =
      if (exactDistinct) df
      else df.select(cols.map(f => col(f.name)) ++ cols.map(f =>
        when(col(f.name).isNotNull, xxhash64(col(f.name)))
          .as(s"__h_${f.name}")): _*)
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__cnt_${f.name}"),
        (if (exactDistinct) countDistinct(c).as(s"__nd_${f.name}")
         else expr(s"kmv_sketch(`__h_${f.name}`, $k)")
           .as(s"__sk_${f.name}")))
      val num = if (isNumeric(f.dataType)) Seq(
        min(c).cast("double").as(s"__min_${f.name}"),
        max(c).cast("double").as(s"__max_${f.name}"),
        round(avg(c.cast("double")), 4).as(s"__avg_${f.name}"))
      else Seq.empty
      base ++ num
    }.toSeq
    val wide = hashed.agg(count(lit(1)).as("__n"), aggs: _*)
    // KMV sketches are deterministic functions of the input SET (min-k
    // over hashes, order-free), so dumping them re-evaluates the
    // aggregate without pinning (contrast QuantileStore's KLL pin)
    dumpPath.filter(_ => !exactDistinct).foreach { p =>
      graft.OracleDump.dump(
        wide.select(explode(array(cols.map(f => struct(
            lit(f.name).as("col_name"),
            col(s"__sk_${f.name}").as("sk"))): _*)).as("e"))
          .select(col("e.col_name"), explode(col("e.sk")).as("v")),
        p)
    }
    val perCol = cols.map { f =>
      val numeric = isNumeric(f.dataType)
      val nd =
        if (exactDistinct) col(s"__nd_${f.name}").as("n_distinct")
        else {
          val sk = col(s"__sk_${f.name}")
          round(when(size(sk) < k, size(sk).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              ApproxQueries.u(element_at(sk, k))), 4)
            .as("n_distinct_est")
        }
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_null"),
        nd,
        (if (numeric) col(s"__min_${f.name}")
         else lit(null).cast("double")).as("min_num"),
        (if (numeric) col(s"__max_${f.name}")
         else lit(null).cast("double")).as("max_num"),
        (if (numeric) col(s"__avg_${f.name}")
         else lit(null).cast("double")).as("avg_num"))
    }
    wide.select(explode(array(perCol: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** KMV size for the approx form: ~1/√k ≈ 2.2% relative error,
    * matching approx_count_distinct's previous 0.02 rsd. */
  val ApproxK = 2048

  private[rel] val ProfileDumpDir = "/tmp/graft_profile_oracle"

  /** Driver entry: the lineitem profile with EXACT distincts (the
    * oracle-checkable form; the approx default is the scale path). */
  def q87Profile(s: SparkSession, d: String): DataFrame =
    profile(lineitem(s, d), exactDistinct = true)

  /** One per-column oracle branch — the scaffolding SHARED by the
    * exact and approx forms (only the distinct column differs, via
    * `distinctSql`): the exact stats must stay bit-identical between
    * the two oracles, so they are generated from one place. */
  private def profileBranch(table: String, name: String, dtype: String,
      numeric: Boolean, distinctSql: String): String = {
    val minS = if (numeric) s"CAST(min($name) AS DOUBLE)"
               else "CAST(NULL AS DOUBLE)"
    val maxS = if (numeric) s"CAST(max($name) AS DOUBLE)"
               else "CAST(NULL AS DOUBLE)"
    val avgS = if (numeric) s"round(avg(CAST($name AS DOUBLE)), 4)"
               else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$name' AS col_name, '$dtype' AS dtype,
       |  count(*) AS n_rows,
       |  count(*) - count($name) AS n_null,
       |  $distinctSql,
       |  $minS AS min_num, $maxS AS max_num, $avgS AS avg_num
       |FROM $table""".stripMargin
  }

  /** Oracle: one UNION ALL branch per column, generated from the same
    * schema the Spark side reflects over — the two engines cannot
    * drift on column lists. */
  private def profileSql(table: String,
      cols: Seq[(String, String, Boolean)]): String =
    cols.map { case (name, dtype, numeric) =>
      profileBranch(table, name, dtype, numeric,
        s"count(DISTINCT $name) AS n_distinct")
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // lineitem's columns, mirrored from TESTDATA.md's fixed schema; the
  // dtype strings are Spark's simpleString names (the driver compares
  // values, and these are data in the result)
  private val LineitemColsV = Seq(
    ("l_orderkey", "bigint", true),
    ("l_partkey", "bigint", true),
    ("l_suppkey", "bigint", true),
    ("l_linenumber", "int", true),
    ("l_quantity", "double", true),
    ("l_extendedprice", "double", true),
    ("l_discount", "double", true),
    ("l_tax", "double", true),
    ("l_returnflag", "string", false),
    ("l_linestatus", "string", false),
    ("l_shipdate", "timestamp_ntz", false))

  val q87Sql: String = profileSql("lineitem", LineitemColsV)

  /** The scale form: KMV distinct estimates, no EXPAND, k-bounded
    * exchange state; hash-oracled (see `profile`'s scaladoc). */
  def nqProfile(s: SparkSession, d: String): DataFrame =
    profile(lineitem(s, d), dumpPath = Some(ProfileDumpDir))

  /** Oracle for the approx form: n_rows/n_null/min/max/avg recomputed
    * EXACTLY from the raw table (the q87 machinery); the distinct
    * estimate re-derives from the dumped per-column sketch via the
    * same (k−1)/u(h_(k)) double chain nq_kmv_distinct proved
    * bit-replicable. */
  private def profileApproxSql(table: String,
      cols: Seq[(String, String, Boolean)], k: Int): String = {
    val branches = cols.map { case (name, dtype, numeric) =>
      profileBranch(table, name, dtype, numeric,
        s"""coalesce((SELECT round(CASE WHEN m < $k THEN m::DOUBLE
           |      ELSE ${(k - 1).toDouble} /
           |        ((kth::DOUBLE + 9223372036854775808.0)
           |          / 18446744073709551616.0) END, 4)
           |    FROM agg WHERE agg.col_name = '$name'), 0.0)
           |    AS n_distinct_est""".stripMargin)
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    s"""WITH agg AS (
       |  SELECT col_name, count(*) AS m, max(v) AS kth
       |  FROM read_parquet('$ProfileDumpDir/*.parquet')
       |  GROUP BY col_name)
       |$branches""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_profile" -> (q87Profile _),
    "nq_profile" -> (nqProfile _))

  val oracle: Map[String, String] = Map(
    "q87_profile" -> q87Sql,
    "nq_profile" -> profileApproxSql("lineitem", LineitemColsV, ApproxK))
}
