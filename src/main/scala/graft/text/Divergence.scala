package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Domain divergence scoring — per-source KL divergence of the
  * source's unigram distribution from the whole-corpus distribution:
  *
  *   KL(p_s ‖ p_c) = Σ_t p_s(t) · ln(p_s(t) / p_c(t))
  *
  * the standard measure of how far a domain's language drifts from
  * the mix (the quantity data-mixing work optimizes against — e.g.
  * DoReMi's domain reweighting — and the natural screen for "which
  * source is the outlier" before setting mixing rates). p_c(t) > 0
  * for every t a source uses (sources are subsets of the corpus), so
  * the ratio is always defined and KL is finite; KL ≥ 0 with equality
  * iff the source matches the corpus distribution exactly.
  *
  * Scale shape: ONE tokenize pass → a (source, term)-keyed count
  * aggregate with map-side combine; corpus-level term counts are an
  * aggregate OVER the per-source counts (vocabulary-sized input, not
  * a second scan); totals ride back as broadcast joins. Floats: each
  * term's contribution is a fixed expression tree over exact longs
  * (two products, one division, one ln, one multiply); the per-source
  * sum of ~vocabulary doubles is order-dependent, so it lands as
  * round(·, 6) — q86's convention for absorbing sum-order noise.
  */
object Divergence {

  /** Per-source KL from the corpus unigram distribution:
    * (source, n_terms, n_tokens, kl). */
  def domainKl(docs: DataFrame, domainCol: String): DataFrame = {
    val terms = docs.select(col(domainCol),
        explode(split(col("text"), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // Referenced FOUR times below (join probe side + corpTerm + srcTot
    // + corpTot): each reference re-runs the corpus tokenize + (source,
    // term) aggregate from the scan (plan: 4 scans + 4 Generates). A
    // cache() here was A/B-measured r19 and REJECTED: the four passes
    // run as concurrent jobs on otherwise-idle cores at test SFs and
    // the cache barrier serialized them (cached ~0.95 s vs uncached
    // ~0.85 s, flat calibrator). On a saturated cluster the 4× tokenize
    // is the real cost — revisit with a vocabulary-sized cache there.
    val srcTerm = terms.groupBy(col(domainCol), col("term"))
      .agg(count(lit(1)).as("cnt_s"))
    val corpTerm = srcTerm.groupBy("term").agg(sum("cnt_s").as("cnt_c"))
    val srcTot = srcTerm.groupBy(domainCol).agg(sum("cnt_s").as("tot_s"))
    val corpTot = srcTerm.agg(sum("cnt_s").as("tot_c"))
    val p = col("cnt_s").cast("double") / col("tot_s").cast("double")
    val ratio = (col("cnt_s").cast("double") * col("tot_c").cast("double")) /
      (col("tot_s").cast("double") * col("cnt_c").cast("double"))
    // corpus term counts are vocabulary-sized — at 100 TB that can be
    // 10^8 rows, so the term join stays UNHINTED (AQE broadcasts it
    // while it fits, falls back to a hash join when it doesn't); only
    // the domain-counted relations are forced broadcast
    srcTerm.join(corpTerm, "term")
      .join(broadcast(srcTot), domainCol)
      .crossJoin(broadcast(corpTot))
      .withColumn("contrib", p * log(ratio))
      .groupBy(domainCol)
      .agg(count(lit(1)).as("n_terms"),
        sum("cnt_s").as("n_tokens"),
        round(sum("contrib"), 6).as("kl"))
      .orderBy(domainCol)
  }

  /** Driver entry: which source's language drifts furthest from the
    * corpus mix. */
  def q93DomainKl(s: SparkSession, d: String): DataFrame =
    domainKl(documents(s, d), "source")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_domain_kl" -> (q93DomainKl _))

  val oracle: Map[String, String] = Map(
    "q93_domain_kl" ->
      """WITH terms AS (
        |  SELECT source,
        |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |                       x -> x <> '')) AS term
        |  FROM documents),
        |st AS (SELECT source, term, count(*) AS cnt_s FROM terms
        |       GROUP BY 1, 2),
        |ct AS (SELECT term, sum(cnt_s) AS cnt_c FROM st GROUP BY 1),
        |tot_s AS (SELECT source, sum(cnt_s) AS tot_s FROM st GROUP BY 1),
        |tot_c AS (SELECT sum(cnt_s) AS tot_c FROM st)
        |SELECT st.source, count(*) AS n_terms,
        |  CAST(sum(cnt_s) AS BIGINT) AS n_tokens,
        |  round(sum(
        |    (CAST(cnt_s AS DOUBLE) / CAST(tot_s AS DOUBLE)) *
        |    ln((CAST(cnt_s AS DOUBLE) * CAST(tot_c AS DOUBLE)) /
        |       (CAST(tot_s AS DOUBLE) * CAST(cnt_c AS DOUBLE)))), 6) AS kl
        |FROM st
        |JOIN ct ON st.term = ct.term
        |JOIN tot_s ON st.source = tot_s.source
        |CROSS JOIN tot_c
        |GROUP BY st.source
        |ORDER BY st.source""".stripMargin)
}
