package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-group quantile normalization — map each group's score
  * distribution onto the GLOBAL score distribution by rank (the
  * quantile-matching transform of Bolstad et al. 2003, bioinformatics'
  * "quantile normalization", = scikit-learn's QuantileTransformer fit
  * on the pooled corpus): a document's calibrated score is the global
  * quantile at its within-group percentile. The mixing family's
  * missing calibration step: per-language quality scores are not
  * comparable across languages (different length/stopword baselines),
  * and gating every language at one raw threshold silently keeps
  * easy languages and guts hard ones — CCNet's per-language terciles
  * (q77) sidestep this with per-group buckets; quantile normalization
  * produces a single comparable SCORE, which downstream temperature
  * mixing (q74) can consume directly.
  *
  * Determinism/exactness: ranks are integers off the total order
  * (score, doc_id); the percentile (r−1)/(n−1), the fractional global
  * position p = pct·(N−1), and the linear interpolation between the
  * two bracketing global order statistics are ONE fixed double tree
  * replicated verbatim in the oracle — identical inputs, identical
  * IEEE ops, identical floor/indexing on both engines. Groups with a
  * single row pin pct = 0.5 (the distribution-free convention; both
  * engines spell the CASE identically).
  *
  * Scale shape: one window per side — within-group rank (group-keyed
  * exchange) and the global order statistics. The exact global rank
  * is a total sort (the q39 exact-percentile bound, documented); the
  * 100 TB path swaps the global side for the engine's KLL sketch
  * (`kll_sketch` quantile lookup at pct — mergeable partials, no
  * total sort) with identical semantics at sketch accuracy. The two
  * index lookups are plain equi-joins on the dense global rank.
  */
object QuantileNorm {

  /** (idCol, groupCol, scoreCol, pct, calibrated) — `pct` the
    * within-group percentile, `calibrated` the interpolated global
    * quantile at it. Exact doubles; callers round for display. */
  def quantileNormalize(rows: DataFrame, groupCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val wg = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol), col(idCol))
    val wgAll = Window.partitionBy(groupCol)
    val wGlob = Window.orderBy(col(scoreCol), col(idCol))
    val base = rows.select(col(idCol), col(groupCol), col(scoreCol))
    // global order statistics: dense 0-based rank → value
    val gv = base
      .select(col(scoreCol).cast("double").as("gval"),
        (row_number().over(wGlob) - 1).cast("long").as("gidx"))
    val nGlob = broadcast(gv.agg(count(lit(1)).as("nn")))
    val ranked = base
      .withColumn("rk", row_number().over(wg).cast("long"))
      .withColumn("ng", count(lit(1)).over(wgAll).cast("long"))
      .crossJoin(nGlob)
      .withColumn("pct",
        when(col("ng") === 1L, lit(0.5))
          .otherwise((col("rk") - lit(1L)).cast("double") /
            (col("ng") - lit(1L)).cast("double")))
      .withColumn("p", col("pct") *
        (col("nn") - lit(1L)).cast("double"))
      .withColumn("lo", floor(col("p")).cast("long"))
      .withColumn("frac", col("p") - col("lo").cast("double"))
    ranked
      .join(gv.select(col("gidx").as("lo"), col("gval").as("vlo")), "lo")
      .join(gv.select((col("gidx") - 1).as("lo"), col("gval").as("vhi")),
        Seq("lo"), "left") // vhi = value at lo+1; null at the top end
      .select(col(idCol), col(groupCol), col(scoreCol), col("pct"),
        (col("vlo") + col("frac") *
          (coalesce(col("vhi"), col("vlo")) - col("vlo")))
          .as("calibrated"))
  }

  // ---------------------------------------------------------------- q109
  /** Contract entry: per-language n_chars distributions calibrated to
    * the global one. round(,6); scores positive, no sign guard. */
  def q109QuantileNorm(s: SparkSession, d: String): DataFrame =
    quantileNormalize(graft.Tables.documents(s, d), "lang", "doc_id",
        "n_chars")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("pct"), 6).as("pct"),
        round(col("calibrated"), 6).as("calibrated"))
      .orderBy("doc_id")

  private[text] val q109Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, n_chars FROM documents),
      |gv AS (
      |  SELECT CAST(n_chars AS DOUBLE) AS gval,
      |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
      |      AS BIGINT) AS gidx
      |  FROM base),
      |nn AS (SELECT count(*) AS nn FROM base),
      |rk AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
      |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS ng
      |  FROM base),
      |px AS (
      |  SELECT r.*, nn.nn,
      |    CASE WHEN r.ng = 1 THEN 0.5
      |      ELSE CAST(r.rk - 1 AS DOUBLE) / CAST(r.ng - 1 AS DOUBLE)
      |    END AS pct
      |  FROM rk r CROSS JOIN nn),
      |pp AS (
      |  SELECT *, pct * CAST(nn - 1 AS DOUBLE) AS p FROM px),
      |ll AS (
      |  SELECT *, CAST(floor(p) AS BIGINT) AS lo,
      |    p - CAST(CAST(floor(p) AS BIGINT) AS DOUBLE) AS frac
      |  FROM pp)
      |SELECT l.doc_id, l.lang, l.n_chars,
      |  round(l.pct, 6) AS pct,
      |  round(vl.gval + l.frac * (COALESCE(vh.gval, vl.gval) - vl.gval),
      |    6) AS calibrated
      |FROM ll l
      |JOIN gv vl ON vl.gidx = l.lo
      |LEFT JOIN gv vh ON vh.gidx = l.lo + 1
      |ORDER BY l.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q109_quantile_norm" -> (q109QuantileNorm _))

  val oracle: Map[String, String] = Map(
    "q109_quantile_norm" -> q109Sql)
}
