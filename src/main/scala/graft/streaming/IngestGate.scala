package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.{QualityRules, TrainPrep}

/** Curation at ingest: the round-8 quality stack (Gopher gates → CCNet
  * LM scoring → per-language bucket) applied to a document STREAM with
  * batch-identical semantics. The batch pipeline calibrates the frozen
  * artifacts — the bigram LM table (`TrainPrep.bigramLm`) and the
  * per-language tercile thresholds (`TrainPrep.ccnetThresholds`) — and
  * this operator applies them at the door, so a document is admitted or
  * rejected the moment it arrives instead of waiting for the next batch
  * curation run. (Wenzek et al. 2020 run exactly this shape: a frozen
  * per-language LM + frozen perplexity buckets applied per document.)
  *
  * Streaming shape, stage by stage:
  *  - Gopher gates: stateless per-row array expressions
  *    (`QualityRules.gopherGates` VERBATIM — one definition, both
  *    engines' modes, so the gate cannot drift from batch q75);
  *  - thresholds: static broadcast side of a stream-static join
  *    (domain-cardinality rows);
  *  - LM scoring: bigram explode (stateless, `TrainPrep.bigramsColumn`
  *    shared with batch lmScore) → stream-static left join against the
  *    vocab²-bounded LM → per-document aggregation grouped on an
  *    event-time window, so the only STATE is the open windows' partial
  *    sums, closed and freed at the watermark. State is bounded by
  *    rate × (window + watermark), never corpus-sized.
  *  - verdict: `bucketFromThresholds` (shared with batch) + the final
  *    keep = gates AND bucket ∈ {head, middle} — CCNet's tail cut.
  *    A null bucket (doc too short to bigram, or unknown language with
  *    null thresholds) makes `keep` FALSE, never null, so
  *    `filter(keep)` and `filter(!keep)` partition the input; the
  *    three-way `verdict` column (admit / reject / unknown) preserves
  *    the "unknown, not tail" distinction for reject audits.
  *
  * Determinism note: avg is order-sensitive in IEEE arithmetic and the
  * streaming plan adds in a different order than batch — `avg_nll` is
  * round()ed to 4 digits exactly like batch `lmScore`, the same
  * discipline the other streaming≡batch proofs use.
  *
  * Run on a BATCH DataFrame the same code computes the same verdicts
  * (watermark is a no-op in batch) — spec-pinned streaming ≡ batch and
  * component-pinned against q75/lmScore/ccnetBucketsApprox.
  */
object IngestGate {

  /** @param docs streaming (or batch) documents with an event-time `ts`
    *             column alongside doc_id/text/lang
    * @param lm frozen bigram LM (w1, w2, n, p) from a calibration run
    * @param thresholds frozen (lang, t1, t2) from `ccnetThresholds` */
  def gateStream(docs: DataFrame, lm: DataFrame, thresholds: DataFrame,
      windowSize: String = "1 hour", watermark: String = "2 hours",
      floorP: Double = 1e-4): DataFrame = {
    val gated = QualityRules.gopherGates(docs)
      .select(col("doc_id"), col("lang"), col("ts"), col("text"),
        col("keep").as("keep_gopher"))
      .join(broadcast(thresholds), Seq("lang"), "left")
    // explode_outer: a doc too short to bigram still reaches the agg
    // (null w1/w2) and gets its verdict row — same "unknown, not tail"
    // contract as the batch scorer
    val bg = gated
      .withColumn("t", TrainPrep.toksColumn)
      .select(col("doc_id"), col("lang"), col("ts"), col("keep_gopher"),
        col("t1"), col("t2"), explode_outer(TrainPrep.bigramsColumn).as("bg"))
      .select(col("doc_id"), col("lang"), col("ts"), col("keep_gopher"),
        col("t1"), col("t2"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bg.join(lm.select(col("w1"), col("w2"), col("p")), Seq("w1", "w2"), "left")
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowSize), col("doc_id"), col("lang"),
        col("keep_gopher"), col("t1"), col("t2"))
      .agg(when(count(col("w1")) > 0, count(col("w1"))).as("n_bigrams"),
        round(avg(TrainPrep.nllColumn(floorP)), 4).as("avg_nll"))
      .select(col("doc_id"), col("lang"), col("keep_gopher"),
        col("n_bigrams"), col("avg_nll"),
        TrainPrep.bucketFromThresholds.as("bucket"))
      .withColumn("keep",
        coalesce(col("keep_gopher") && col("bucket").isin("head", "middle"),
          lit(false)))
      .withColumn("verdict",
        when(col("keep"), "admit")
          .when(col("keep_gopher") && col("bucket").isNull, "unknown")
          .otherwise("reject"))
  }
}
