package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PMI collocation mining — the word2phrase step of training-data
  * pipelines (Mikolov 2013 "Distributed Representations of Words and
  * Phrases": score adjacent word pairs, promote high scorers to
  * phrases): for each adjacent pair (x, y)
  *
  *   pmi = ln( P(x,y) / (P(x)·P(y)) )
  *       = ln( c_xy · N_uni² / (c_x · c_y · N_bi) )
  *
  * over whitespace tokens, with a minimum pair count to kill the
  * hapax-pair noise floor (exactly word2phrase's `min_count`).
  *
  * Spark-first shape: bigram extraction is a NARROW per-doc map
  * (`transform` over the token array — no per-token window, no
  * shuffle); then two hash aggregations (pair counts, unigram counts)
  * and two vocabulary-keyed equi-joins of count tables — at 100 TB the
  * shuffled relations are vocabulary-sized (counts), never
  * corpus-sized (tokens), and the two corpus-wide totals ride the
  * `broadcast(single-row agg)` scalar idiom. Ranking sorts the
  * pair-count table, which the min-count filter has already shrunk.
  *
  * Oracle: fully SQL-expressible from the raw documents table (the
  * q65/q69 tier — no dumps): DuckDB re-tokenizes, re-counts, and
  * re-runs the single shared-order double tree `ln(c_xy·NU·NU /
  * (c_x·c_y·NB))`, so round-6 comparison is exact.
  */
object Collocations {

  /** Top collocations by PMI. Returns (w1, w2, c_xy, c_x, c_y, pmi)
    * with pmi rounded to 6, ordered by (pmi desc, w1, w2), limited to
    * `topK`. */
  def pmi(docs: DataFrame, minPair: Long = 3L, topK: Int = 200,
      textCol: String = "text"): DataFrame = {
    require(minPair >= 1 && topK >= 1,
      s"minPair/topK must be positive: $minPair/$topK")
    val toks = docs.select(
      expr(raw"split($textCol, '\\s+')").as("ts"))
    val uni = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c_w"))
    val biAll = toks.filter(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2)," +
          " i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val bi = biAll.filter(col("c_xy") >= minPair)
    // the corpus totals come from the COUNT TABLES, not a third corpus
    // scan: Σc_w ≡ N_uni and Σc_xy ≡ N_bi by construction, and nb's
    // aggregation subtree is identical to bi's, so Spark reuses the
    // exchange — two corpus scans total (unigrams, bigrams)
    val totals = uni.agg(sum("c_w").as("nu"))
      .crossJoin(biAll.agg(sum("c_xy").as("nb")))
    bi
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      // ONE shared-order double tree — written identically in the
      // oracle SQL so the ln argument is bitwise shared
      .withColumn("pmi", round(log(
        col("c_xy").cast("double") * col("nu") * col("nu") /
          (col("c_x").cast("double") * col("c_y") * col("nb"))), 6))
      .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi")
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q97_pmi_collocations" -> ((s: SparkSession, d: String) =>
      pmi(graft.Tables.documents(s, d))))

  val oracle: Map[String, String] = Map(
    "q97_pmi_collocations" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ts
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(ts) AS w, unnest(range(len(ts))) AS i
        |  FROM tk),
        |uni AS (SELECT w, count(*) AS c_w FROM tok GROUP BY w),
        |adj AS (
        |  SELECT doc_id, w AS w1,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
        |  FROM tok),
        |bi AS (
        |  SELECT w1, w2, count(*) AS c_xy FROM adj
        |  WHERE w2 IS NOT NULL
        |  GROUP BY w1, w2 HAVING count(*) >= 3),
        |tot AS (
        |  SELECT (SELECT CAST(sum(c_w) AS BIGINT) FROM uni) AS nu,
        |    (SELECT CAST(sum(len(ts) - 1) AS BIGINT) FROM tk
        |     WHERE len(ts) >= 2) AS nb)
        |SELECT w1, w2, c_xy,
        |  u1.c_w AS c_x, u2.c_w AS c_y,
        |  round(ln(CAST(c_xy AS DOUBLE) * nu * nu /
        |    (CAST(u1.c_w AS DOUBLE) * u2.c_w * nb)), 6) AS pmi
        |FROM bi
        |JOIN uni u1 ON u1.w = bi.w1
        |JOIN uni u2 ON u2.w = bi.w2
        |CROSS JOIN tot
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 200""".stripMargin)
}
