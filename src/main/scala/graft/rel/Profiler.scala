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
  * contract (q87), `approx_count_distinct` (HLL partials, no EXPAND)
  * as the default scale path — the same exact/approx pairing as
  * q11 vs nq_approx_distinct.
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
    * n_distinct, min_num, max_num, avg_num). */
  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    val aggs: Seq[Column] = cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"__cnt_${f.name}"),
        (if (exactDistinct) countDistinct(c)
         else approx_count_distinct(c, 0.02)).as(s"__nd_${f.name}"))
      val num = if (isNumeric(f.dataType)) Seq(
        min(c).cast("double").as(s"__min_${f.name}"),
        max(c).cast("double").as(s"__max_${f.name}"),
        round(avg(c.cast("double")), 4).as(s"__avg_${f.name}"))
      else Seq.empty
      base ++ num
    }.toSeq
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = cols.map { f =>
      val numeric = isNumeric(f.dataType)
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_null"),
        col(s"__nd_${f.name}").as("n_distinct"),
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

  /** Driver entry: the lineitem profile with EXACT distincts (the
    * oracle-checkable form; the approx default is the scale path). */
  def q87Profile(s: SparkSession, d: String): DataFrame =
    profile(lineitem(s, d), exactDistinct = true)

  /** Oracle: one UNION ALL branch per column, generated from the same
    * schema the Spark side reflects over — the two engines cannot
    * drift on column lists. */
  private def profileSql(table: String,
      cols: Seq[(String, String, Boolean)]): String =
    cols.map { case (name, dtype, numeric) =>
      val minS = if (numeric) s"CAST(min($name) AS DOUBLE)"
                 else "CAST(NULL AS DOUBLE)"
      val maxS = if (numeric) s"CAST(max($name) AS DOUBLE)"
                 else "CAST(NULL AS DOUBLE)"
      val avgS = if (numeric) s"round(avg(CAST($name AS DOUBLE)), 4)"
                 else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$name' AS col_name, '$dtype' AS dtype,
         |  count(*) AS n_rows,
         |  count(*) - count($name) AS n_null,
         |  count(DISTINCT $name) AS n_distinct,
         |  $minS AS min_num, $maxS AS max_num, $avgS AS avg_num
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  // lineitem's columns, mirrored from TESTDATA.md's fixed schema; the
  // dtype strings are Spark's simpleString names (the driver compares
  // values, and these are data in the result)
  val q87Sql: String = profileSql("lineitem", Seq(
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
    ("l_shipdate", "timestamp_ntz", false)))

  /** The scale form: HLL distincts, no EXPAND — deterministic
    * (register-max is order-free), rows-only checked. */
  def nqProfile(s: SparkSession, d: String): DataFrame =
    profile(lineitem(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_profile" -> (q87Profile _),
    "nq_profile" -> (nqProfile _))

  val oracle: Map[String, String] = Map(
    "q87_profile" -> q87Sql)
}
