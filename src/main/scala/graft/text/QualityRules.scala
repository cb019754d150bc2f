package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Gopher-style document quality gates — the published rule bundle of
  * Rae et al. 2021 ("Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", Table A1), the de-facto public
  * recipe for pre-training corpus filtering. Where q24 emits CONTINUOUS
  * quality scores, this operator applies the decision layer: each rule
  * is a boolean gate with Gopher's own thresholds, emitted per-rule so
  * a pipeline can audit WHICH gate rejected a document, plus the
  * conjunction `keep`.
  *
  * Rules (thresholds from the paper):
  *  - 50 ≤ word count ≤ 100,000
  *  - 3 ≤ mean word length ≤ 10
  *  - symbol-to-word ratio ≤ 0.1 (hash marks and ellipses)
  *  - ≤ 90% of lines start with a bullet; ≤ 30% end with an ellipsis
  *  - ≥ 80% of words contain at least one alphabetic character
  *  - at least 2 distinct members of a small English stop-word list
  *
  * Generalizes the reference's scalar threshold filters (survey C1,
  * `/root/reference/src/voice_classifier.py:96`) to the multi-predicate
  * document gate a curation pipeline runs first.
  *
  * Scale shape: every rule is a codegen'd per-row array expression over
  * the document's own tokens/lines — a narrow projection at scan speed,
  * no shuffle, no UDF, trivially partition-parallel at any corpus size.
  * The one `orderBy` is the contract's presentation sort.
  *
  * Cross-engine determinism: all ratios are single IEEE divisions of
  * exact integer counts, so DuckDB reproduces them bit-for-bit; the
  * boolean gates compare those identical doubles against literal
  * thresholds shared with the oracle SQL.
  */
object QualityRules {

  /** The gates over ANY documents relation (batch or streaming — pure
    * stateless row expressions, so the ingest gate runs this verbatim):
    * returns the input's columns plus the metric columns and `keep`. */
  def gopherGates(docs: DataFrame): DataFrame = {
    val nt = size(col("t"))
    val nl = size(col("ln"))
    def tokFrac(pred: String): org.apache.spark.sql.Column =
      when(nt > 0,
        expr(s"size(filter(t, x -> $pred))").cast("double") / nt)
        .otherwise(lit(0.0))
    def lineFrac(pred: String): org.apache.spark.sql.Column =
      when(nl > 0,
        expr(s"size(filter(ln, x -> $pred))").cast("double") / nl)
        .otherwise(lit(0.0))
    docs
      .withColumn("t",
        expr("filter(split(text, '\\\\s+'), x -> length(x) > 0)"))
      .withColumn("ln", split(col("text"), "\n"))
      .withColumns(Map(
        "n_tokens" -> nt.cast("long"),
        "mean_word_len" -> when(nt > 0,
          expr("aggregate(t, 0L, (a, x) -> a + length(x))").cast("double") / nt)
          .otherwise(lit(0.0)),
        "frac_symbol_words" -> tokFrac(
          "contains(x, '#') OR contains(x, '...') OR contains(x, '…')"),
        "frac_alpha_words" -> tokFrac("x rlike '[A-Za-z]'"),
        "frac_bullet_lines" -> lineFrac(
          "startswith(ltrim(x), '-') OR startswith(ltrim(x), '*') " +
            "OR startswith(ltrim(x), '•')"),
        "frac_ellipsis_lines" -> lineFrac(
          "endswith(rtrim(x), '...') OR endswith(rtrim(x), '…')"),
        "n_stopwords" -> expr(
          "size(array_distinct(filter(t, x -> lower(x) IN " +
            "('the','be','to','of','and','that','have','with'))))")
          .cast("long")))
      .withColumn("keep",
        col("n_tokens").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("frac_symbol_words") <= 0.1 &&
          col("frac_alpha_words") >= 0.8 &&
          col("frac_bullet_lines") <= 0.9 &&
          col("frac_ellipsis_lines") <= 0.3 &&
          col("n_stopwords") >= 2L)
      .drop("t", "ln")
  }

  def q75GopherRules(s: SparkSession, d: String): DataFrame =
    gopherGates(documents(s, d))
      .select("doc_id", "n_tokens", "mean_word_len", "frac_symbol_words",
        "frac_alpha_words", "frac_bullet_lines", "frac_ellipsis_lines",
        "n_stopwords", "keep")
      .orderBy("doc_id")

  /** The whole gate chain as a WITH-less CTE body ending in
    * `gop(doc_id, <metrics...>, keep)` — composed verbatim by the
    * end-to-end pipeline oracle (r18); [[q75Sql]] is `WITH ` + this +
    * the presentation select. */
  private[text] val gopherCtesBody: String =
    """d AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t,
      |    string_split(text, chr(10)) AS ln
      |  FROM documents
      |), m AS (
      |  SELECT doc_id,
      |    CAST(len(t) AS BIGINT) AS n_tokens,
      |    CASE WHEN len(t) > 0 THEN
      |      CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
      |        / len(t) ELSE 0.0 END AS mean_word_len,
      |    CASE WHEN len(t) > 0 THEN
      |      CAST(len(list_filter(t, x -> contains(x, '#')
      |        OR contains(x, '...') OR contains(x, '…'))) AS DOUBLE)
      |        / len(t) ELSE 0.0 END AS frac_symbol_words,
      |    CASE WHEN len(t) > 0 THEN
      |      CAST(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
      |        AS DOUBLE) / len(t) ELSE 0.0 END AS frac_alpha_words,
      |    CASE WHEN len(ln) > 0 THEN
      |      CAST(len(list_filter(ln, x -> starts_with(ltrim(x), '-')
      |        OR starts_with(ltrim(x), '*') OR starts_with(ltrim(x), '•')))
      |        AS DOUBLE) / len(ln) ELSE 0.0 END AS frac_bullet_lines,
      |    CASE WHEN len(ln) > 0 THEN
      |      CAST(len(list_filter(ln, x -> ends_with(rtrim(x), '...')
      |        OR ends_with(rtrim(x), '…'))) AS DOUBLE)
      |        / len(ln) ELSE 0.0 END AS frac_ellipsis_lines,
      |    CAST(len(list_distinct(list_filter(t, x -> lower(x) IN
      |      ('the','be','to','of','and','that','have','with'))))
      |      AS BIGINT) AS n_stopwords
      |  FROM d
      |), gop AS (
      |  SELECT *,
      |    (n_tokens BETWEEN 50 AND 100000
      |      AND mean_word_len BETWEEN 3.0 AND 10.0
      |      AND frac_symbol_words <= 0.1
      |      AND frac_alpha_words >= 0.8
      |      AND frac_bullet_lines <= 0.9
      |      AND frac_ellipsis_lines <= 0.3
      |      AND n_stopwords >= 2) AS keep
      |  FROM m
      |)""".stripMargin

  val q75Sql: String = "WITH " + gopherCtesBody +
    "\nSELECT * FROM gop ORDER BY doc_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_gopher_rules" -> (q75GopherRules _))

  val oracle: Map[String, String] = Map(
    "q75_gopher_rules" -> q75Sql)
}
