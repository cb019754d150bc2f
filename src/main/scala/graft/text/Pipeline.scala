package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The COMPOSED curation pipeline a pretraining run actually executes
  * (VERDICT r17 #4) — every stage below is individually oracled, but
  * until this entry nothing proved the composition: Gopher gates
  * (q75) → exact dedup (q23's keeper rule) → MinHash cluster keepers
  * (the banded nq_dedup_clusters relation) → substring cut (q76) →
  * temperature mix (q74) → shard-parallel pack (q58's arithmetic),
  * one output relation:
  *
  *   (doc_id, lang, kept, reason, shard, pack_id, pack_offset)
  *
  * Gate semantics (the Curation.curate precedent): the content gates
  * are computed corpus-wide and composed by PRECEDENCE — reason = the
  * first failing stage in pipeline order ('gopher', 'exact_dup',
  * 'near_dup', 'substr_dup', 'mix_out'), NULL = kept. The two stages
  * where composition is load-bearing run on the SURVIVOR set: the
  * pack's cumulative offsets cover exactly the kept docs (any
  * upstream drift moves every later doc's pack_id/pack_offset → the
  * whole tail hash-fails), and they pack the post-substring-cut token
  * counts, not the raw ones (a training run packs the deduped text).
  *
  * The oracle composes the stages' existing shared CTE bodies
  * VERBATIM (the q81 discipline): NearDup.bandedReachCtes (the full
  * minhash/band/verify replica + recursive reach),
  * Curation.gateCoreCtes (cluster + exact keepers),
  * QualityRules.gopherCtesBody, SubstrDedup.spanCtesBody, and
  * Mixing.mixCtesBody — so a change to ANY stage's semantics breaks
  * this entry unless its own oracle moved identically.
  *
  * Scale shape: every stage is its already-audited scale form (banded
  * candidates, per-doc span lambdas, broadcast rate tables); the pack
  * window partitions by (lang, shard) — parallelism grows with
  * shards × langs, never a global sort. The composition adds only
  * doc-keyed equi-joins on the narrow per-stage verdict relations —
  * at 100 TB those are doc-count-sized (id + enum columns), not
  * corpus-content-sized.
  */
object Pipeline {

  private[text] val PackSeqLen = 2048
  private[text] val PackShards = 8

  /** Stage 1's verdict — q75's metric computation verbatim, gated on
    * the STRUCTURAL rule subset (everything but the English-stop-word
    * rule): the stop-word list is calibrated to natural English and
    * zeroes out on the driver's word-salad corpus, which would starve
    * every downstream stage of input — exactly the per-corpus
    * threshold tuning every real Gopher deployment documents (Rae et
    * al. 2021 §A1 applies the rules per-corpus). The oracle gates on
    * the same subset over the shared metric CTEs.
    * coalesce-to-false pins the null-text outcome (r18 review): a
    * null text yields NULL metrics on the DuckDB side (len(NULL)),
    * and engine-dependent null/-1 sizes on the Spark side — both
    * must deterministically DROP the doc as 'gopher', not let a NULL
    * gate fall through the precedence CASE. Shared verbatim with the
    * incremental pipeline ([[PipelineInc]]) so the gate subset cannot
    * drift between the batch and serving paths. */
  private[text] def structuralGate(docs: DataFrame): DataFrame =
    QualityRules.gopherGates(docs)
      .select(col("doc_id"),
        coalesce(
          col("n_tokens").between(50L, 100000L) &&
            col("mean_word_len").between(3.0, 10.0) &&
            col("frac_symbol_words") <= 0.1 &&
            col("frac_alpha_words") >= 0.8 &&
            col("frac_bullet_lines") <= 0.9 &&
            col("frac_ellipsis_lines") <= 0.3,
          lit(false)).as("gopher_keep"))

  /** The pipeline-precedence CASE — reason = first failing stage in
    * pipeline order, NULL = kept. One definition serves the batch and
    * incremental pipelines (stage-interface drift between the two
    * would otherwise silently change serving verdicts). */
  private[text] def reasonCol: org.apache.spark.sql.Column =
    when(!col("gopher_keep"), "gopher")
      .when(!col("is_exact_keeper"), "exact_dup")
      .when(col("doc_id") =!= col("cluster_id"), "near_dup")
      .when(col("n_tokens") > 0L && col("n_tokens_kept") === 0L,
        "substr_dup")
      .when(col("mix_in").isNull, "mix_out")

  def nqPipelineE2e(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    // stage 1: Gopher structural gates (see structuralGate's scaladoc)
    val gop = structuralGate(docs)
    // stage 2: exact-duplicate keeper (q23's min-id-per-fingerprint)
    val exact = docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("is_exact_keeper",
        col("doc_id") === min("doc_id").over(
          Window.partitionBy("fp")))
      .select("doc_id", "is_exact_keeper")
    // stage 3: MinHash-banded near-dup clusters (memoized — the same
    // standing relation nq_dedup_clusters / nq_curation prove)
    val clusters = DedupClusters.dedupClusters(s, d)
      .select(col("doc_id"), col("cluster_id"))
    // stage 4: substring cut (q76's exact span machinery; the kept
    // token count feeds the pack, and a fully-duplicated doc drops)
    val cut = SubstrDedup.q76SubstrCut(s, d)
      .select(col("doc_id"), col("n_tokens"), col("n_tokens_kept"))
    // stage 5: temperature mix (q74's exact selection relation)
    val mixSel = Mixing
      .temperatureMix(docs, "lang", "doc_id", Mixing.q74Alpha)
      .select(col("doc_id"), lit(true).as("mix_in"))
    val verdict = docs.select("doc_id", "lang")
      .join(gop, "doc_id")
      .join(exact, "doc_id")
      .join(clusters, "doc_id")
      .join(cut, "doc_id")
      .join(mixSel, Seq("doc_id"), "left")
      .withColumn("reason", reasonCol)
    // stage 6: q58's shard-parallel pack arithmetic over the SURVIVOR
    // set's post-cut token counts
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    val packed = verdict.filter(col("reason").isNull)
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % lit(PackShards.toLong)).as("shard"),
        col("n_tokens_kept"))
      .withColumn("start_tok",
        coalesce(sum("n_tokens_kept").over(w) - col("n_tokens_kept"),
          lit(0L)))
      .select(col("doc_id"), col("shard"),
        (col("start_tok") / PackSeqLen).cast("long").as("pack_id"),
        (col("start_tok") % PackSeqLen).as("pack_offset"))
    verdict
      .select(col("doc_id"), col("lang"),
        col("reason").isNull.as("kept"), col("reason"))
      .join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("kept"), col("reason"),
        col("shard"), col("pack_id"), col("pack_offset"))
      .orderBy("doc_id")
  }

  /** The precedence-verdict CTE chain appended after the stage bodies
    * — ends in `verdict(doc_id, lang, reason, n_kept)`. Split out
    * (r19) so [[PipelineInc]]'s per-batch at-ingest chains compose the
    * SAME text (with only the corpus-prefix substitution) — the q81
    * verbatim-SQL discipline applied to the serving tier. */
  private[text] val verdictCtesTail: String =
    """,
      |pgate AS (
      |  SELECT doc_id,
      |    coalesce(n_tokens BETWEEN 50 AND 100000
      |      AND mean_word_len BETWEEN 3.0 AND 10.0
      |      AND frac_symbol_words <= 0.1
      |      AND frac_alpha_words >= 0.8
      |      AND frac_bullet_lines <= 0.9
      |      AND frac_ellipsis_lines <= 0.3, FALSE) AS keep
      |  FROM m
      |), cov AS (
      |  SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_cov
      |  FROM sp GROUP BY doc_id
      |), cut AS (
      |  SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_toks,
      |    CAST(len(t.l) AS BIGINT) - coalesce(c2.n_cov, 0) AS n_kept
      |  FROM toks t LEFT JOIN cov c2 USING (doc_id)
      |), verdict AS (
      |  SELECT dd.doc_id, dd.lang,
      |    CASE WHEN NOT g.keep THEN 'gopher'
      |         WHEN NOT ek.is_exact_keeper THEN 'exact_dup'
      |         WHEN dd.doc_id <> cl.cluster_id THEN 'near_dup'
      |         WHEN ct.n_toks > 0 AND ct.n_kept = 0 THEN 'substr_dup'
      |         WHEN ms.doc_id IS NULL THEN 'mix_out'
      |    END AS reason,
      |    ct.n_kept
      |  FROM documents dd
      |  JOIN pgate g USING (doc_id)
      |  JOIN ek USING (doc_id)
      |  JOIN clusters cl USING (doc_id)
      |  JOIN cut ct USING (doc_id)
      |  LEFT JOIN mixsel ms USING (doc_id)
      |)""".stripMargin

  /** The composed oracle: the stage CTE bodies verbatim, then the
    * precedence verdict and the survivor pack — mirrors of the Spark
    * expressions above (the q58/q56 window arithmetic text). */
  private lazy val nqPipelineSql: String =
    NearDup.bandedReachCtes +
      Curation.gateCoreCtes +
      ",\n" + QualityRules.gopherCtesBody +
      ",\n" + SubstrDedup.spanCtesBody +
      ",\n" + Mixing.mixCtesBody +
      verdictCtesTail +
      s""", packed AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    sum(n_kept) OVER (PARTITION BY lang, doc_id % $PackShards
         |                      ORDER BY doc_id)
         |      - n_kept AS start_tok
         |  FROM verdict WHERE reason IS NULL
         |)
         |SELECT v.doc_id, v.lang, v.reason IS NULL AS kept, v.reason,
         |  p.shard,
         |  CAST(floor(p.start_tok / $PackSeqLen) AS BIGINT) AS pack_id,
         |  CAST(p.start_tok % $PackSeqLen AS BIGINT) AS pack_offset
         |FROM verdict v LEFT JOIN packed p USING (doc_id)
         |ORDER BY v.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_pipeline_e2e" -> (nqPipelineE2e _))

  val oracle: Map[String, String] = Map(
    "nq_pipeline_e2e" -> nqPipelineSql)
}
