package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text augmentation — seeded word dropout (the EDA family, Wei & Zou
  * 2019: drop each token independently with probability p), the text
  * sibling of the audio [[graft.audio.SpecAugment]] / [[graft.audio.Augment]]
  * tier. Reproducible-epoch discipline: the per-token decision is
  * `pmod(xxhash64(doc_id·2²⁰ + i + seed, 42L), 100) ≥ p` — pure column
  * arithmetic inside ONE higher-order-function chain (transform →
  * filter → array_join), so the whole op is a narrow per-row map: no
  * shuffle, no UDF, no driver randomness, embarrassingly parallel at
  * any corpus size.
  *
  * Oracle strength: because the decision hash is Spark's `xxhash64`
  * and the repo owns a step-exact DuckDB replica of it
  * ([[Mixing.xxh64CtesOver]]), the ENTIRE op — tokenize, key, hash,
  * keep/drop, re-join — re-runs in DuckDB from the raw documents table
  * with NO dumped inputs at all: the strongest oracle form in the
  * contract (same tier as q65/q69/q74).
  *
  * Key packing note: `doc_id·2²⁰ + i` gives distinct decision keys as
  * long as docs stay under 2²⁰ tokens; a longer doc only CORRELATES
  * its overflow tokens' decisions with a neighbouring doc's (both
  * engines agree bit-for-bit either way — this bounds statistical
  * independence, not correctness).
  */
object TextAugment {

  /** Append `n_tokens`, `n_kept`, `text_aug` (tokens surviving the
    * seeded dropout, single-space re-joined). `pDropPct` is the drop
    * probability in percent. */
  def wordDropout(docs: DataFrame, pDropPct: Int = 10, seed: Long = 0L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(pDropPct >= 0 && pDropPct <= 100,
      s"pDropPct must be a percentage, got $pDropPct")
    val toks = raw"split($textCol, '\\s+')"
    val key = s"$idCol * CAST(1048576 AS BIGINT) + CAST(i AS BIGINT)" +
      s" + CAST($seed AS BIGINT)"
    docs
      .withColumn("_kept", expr(
        s"""filter(
           |  transform($toks, (t, i) -> named_struct(
           |    't', t,
           |    'keep', pmod(xxhash64($key, CAST(42 AS BIGINT)), 100)
           |      >= $pDropPct)),
           |  x -> x.keep)""".stripMargin))
      .withColumn("n_tokens", size(expr(toks)).cast("long"))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .withColumn("text_aug",
        expr("array_join(transform(_kept, x -> x.t), ' ')"))
      .drop("_kept")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // p = 10% dropout over the documents table, seed 0 — hash-checked
    // end to end from the raw table (no dumps; see object doc).
    "nq_word_dropout" -> ((s: SparkSession, d: String) =>
      wordDropout(graft.Tables.documents(s, d))
        .select("doc_id", "n_tokens", "n_kept", "text_aug")
        .orderBy("doc_id")))

  val oracle: Map[String, String] = Map(
    "nq_word_dropout" -> (Mixing.xxh64CtesOver(
      // one row per (doc, 0-based token position), keyed exactly like
      // the Spark lambda; regexp split matches Spark's split('\s+')
      // NB: the key column must NOT be named `k`/`k2`/`h1`… — those are
      // the chain's internal aliases and DuckDB's ambiguous resolution
      // silently types the mix as DOUBLE.
      """(SELECT doc_id, tok, i,
        |  doc_id * 1048576 + i + 0 AS dk
        |FROM (SELECT doc_id, unnest(ts) AS tok,
        |        unnest(range(len(ts))) AS i
        |      FROM (SELECT doc_id,
        |              regexp_split_to_array(text, '\s+') AS ts
        |            FROM documents))) tk""".stripMargin,
      "dk", ", doc_id, tok, i") +
      s""",
         |dec AS (
         |  SELECT doc_id, tok, i,
         |    -- Spark's SIGNED pmod(h, 100) from the unsigned hh:
         |    -- 2^64 mod 100 = 16, so values >= 2^63 shift by +84
         |    CASE WHEN hh >= CAST(9223372036854775808 AS UHUGEINT)
         |      THEN (hh % 100 + 84) % 100 ELSE hh % 100 END AS r
         |  FROM r2h)
         |SELECT doc_id,
         |  count(*) AS n_tokens,
         |  count(*) FILTER (WHERE r >= 10) AS n_kept,
         |  coalesce(string_agg(tok, ' ' ORDER BY i)
         |    FILTER (WHERE r >= 10), '') AS text_aug
         |FROM dec
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin))
}
