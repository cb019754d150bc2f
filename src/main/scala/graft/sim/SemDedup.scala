package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup
  * recipe (Abbas et al. 2023, arXiv:2303.09540): k-means the embedding
  * space, then score cosine similarity ONLY within each cluster and
  * drop every vector that has a near-twin with a smaller id, keeping
  * the smallest id of each semantic-duplicate set's chain.
  *
  * Scale shape (the whole point of the cluster step): the candidate
  * self-join's key is (cluster), so pair volume is Σ_c n_c² instead of
  * corpus² — k is picked so n_c ≈ corpus/k stays bounded (SemDeDup used
  * k = 11k clusters for 233M embeddings; k should grow ~√corpus). The
  * join is a co-shuffled equi-join on a k-cardinality key; no relation
  * is broadcast (the corpus side scales), no pair leaves its cluster,
  * and the per-pair score is the codegen'd `vec_dot` on pre-computed
  * norms. Skewed cluster sizes are AQE's skew-split case (equi-join).
  *
  * Keeper policy: a vector is a duplicate iff ANY smaller-id vector in
  * its cluster is within `threshold` cosine — i.e. min-id-wins along
  * chains, matching the exact-dedup keeper convention (q23) and
  * SemDeDup's "keep one example per group". Seeded k-means → repeated
  * runs on the same input are deterministic (pinned in SemDedupSpec);
  * across a DIFFERENT input partitioning the trained centers can shift
  * (MLlib's seeded init samples per partition), moving boundary
  * assignments — inherent to every clustering-bucketed dedup; fix the
  * upstream layout for bit-reproducible re-materialization.
  *
  * Not SQL-expressible (iterative k-means training) → rows-only driver
  * check; the within-cluster dedup semantics are spec-pinned on planted
  * fixtures instead.
  */
object SemDedup {

  /** Core operator over any (id, embedding ARRAY<FLOAT>) frame.
    * Returns one row per input vector: (id, cluster, is_dup) — callers
    * keep `!is_dup`.
    */
  def semanticDedup(vecs: DataFrame, idCol: String, embCol: String,
      k: Int = 16, threshold: Double = 0.97, seed: Long = 42L): DataFrame = {
    val s = vecs.sparkSession
    graft.functions.VecFunctions.register(s)
    val e = vecs.select(col(idCol).as("id"), col(embCol).as("emb"),
      array_to_vector(col(embCol)).as("v"),
      sqrt(expr(s"vec_dot($embCol, $embCol)")).as("nrm"))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("v")
      .setPredictionCol("cluster").fit(e)
    val assigned = model.transform(e)
      .select(col("id"), col("emb"), col("nrm"), col("cluster"))
    // within-cluster candidate pairs, scored one direction only
    // (lo < hi): the higher id is the one at risk of dropping
    val lo = assigned.select(col("cluster"), col("id").as("lo_id"),
      col("emb").as("lo_emb"), col("nrm").as("lo_nrm"))
    val hi = assigned.select(col("cluster"), col("id").as("hi_id"),
      col("emb").as("hi_emb"), col("nrm").as("hi_nrm"))
    val dups = hi.join(lo,
        hi("cluster") === lo("cluster") && col("lo_id") < col("hi_id"))
      .filter(expr("vec_dot(hi_emb, lo_emb)") / (col("hi_nrm") * col("lo_nrm"))
        >= threshold)
      .select(col("hi_id").as("id")).distinct()
    assigned.select(col("id"), col("cluster"))
      .join(dups.withColumn("__d", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
      .orderBy("id")
  }

  /** Projection + cluster assignment under an ALREADY-TRAINED model —
    * the reusable artifact of the incremental path (the analogue of the
    * text side's persisted signature store: train once over the corpus,
    * assign forever). One narrow pass; the model's k×dim centers ride
    * the closure. */
  def assign(model: org.apache.spark.ml.clustering.KMeansModel,
      vecs: DataFrame, idCol: String, embCol: String): DataFrame = {
    val s = vecs.sparkSession
    graft.functions.VecFunctions.register(s)
    model.transform(
      vecs.select(col(idCol).as("id"), col(embCol).as("emb"),
        array_to_vector(col(embCol)).as("v"),
        sqrt(expr(s"vec_dot($embCol, $embCol)")).as("nrm")))
      .select(col("id"), col("emb"), col("nrm"), col("cluster"))
  }

  /** Incremental semantic dedup: verdicts for a NEW batch against an
    * existing corpus without ever re-scoring corpus × corpus — the
    * SemDeDup analogue of `NearDup.minhashNeardupIncremental`. Both
    * inputs carry assignments from the SAME corpus-trained model (via
    * `assign`); a batch vector drops iff it has a same-cluster
    * near-twin in the corpus (any id) or an earlier (lower-id)
    * same-cluster twin in its own batch.
    *
    * Scale shape: both candidate joins are equi-joins on the cluster
    * key — batch × corpus is linear in the batch's cluster-mate count,
    * batch × batch is the intra-batch triangle; the corpus is scanned
    * once and NEVER self-joined. Assignment reuses the stored model,
    * so per-batch cost is independent of how many batches preceded.
    */
  def semanticDedupIncremental(corpusAssigned: DataFrame,
      batchAssigned: DataFrame, threshold: Double = 0.97): DataFrame = {
    val cor = corpusAssigned.select(col("cluster"), col("id").as("lo_id"),
      col("emb").as("lo_emb"), col("nrm").as("lo_nrm"))
    val bLo = batchAssigned.select(col("cluster"), col("id").as("lo_id"),
      col("emb").as("lo_emb"), col("nrm").as("lo_nrm"))
    val bHi = batchAssigned.select(col("cluster"), col("id").as("hi_id"),
      col("emb").as("hi_emb"), col("nrm").as("hi_nrm"))
    def twins(lo: DataFrame, requireLower: Boolean): DataFrame = {
      val cond0 = bHi("cluster") === lo("cluster")
      val cond = if (requireLower) cond0 && col("lo_id") < col("hi_id")
        else cond0
      bHi.join(lo, cond)
        .filter(expr("vec_dot(hi_emb, lo_emb)") /
          (col("hi_nrm") * col("lo_nrm")) >= threshold)
        .select(col("hi_id").as("id"))
    }
    batchAssigned.select(col("id"), col("cluster"))
      .join(twins(cor, requireLower = false)
          .unionAll(twins(bLo, requireLower = true))
          .distinct().withColumn("__d", lit(true)),
        Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
      .orderBy("id")
  }

  /** Driver entry over the embeddings table. threshold=0.97 on this
    * corpus flags only true near-twins (the synthetic embeddings are
    * near-uniform on the sphere; see SemDedupSpec's planted fixture for
    * the semantics check). */
  def semanticDedupQuery(s: SparkSession, d: String): DataFrame =
    semanticDedup(graft.Tables.embeddings(s, d), "vec_id", "embedding")
      .withColumnRenamed("id", "vec_id")

  /** Incremental entry: vec_id ≡ 0 (mod 10) plays the new batch, the
    * rest the standing corpus; the model trains on the corpus only
    * (the batch must not influence the buckets it is judged in). */
  def semanticDedupIncrementalQuery(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    val all = graft.Tables.embeddings(s, d)
    val corpus = all.filter(col("vec_id") % 10 =!= 0)
    val batch = all.filter(col("vec_id") % 10 === 0)
    val e = corpus.select(col("vec_id"),
      array_to_vector(col("embedding")).as("v"))
    val model = new KMeans().setK(16).setSeed(42).setFeaturesCol("v")
      .setPredictionCol("cluster").fit(e)
    semanticDedupIncremental(
      assign(model, corpus, "vec_id", "embedding"),
      assign(model, batch, "vec_id", "embedding"))
      .withColumnRenamed("id", "vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_semantic_dedup" -> (semanticDedupQuery _),
    "nq_semantic_dedup_inc" -> (semanticDedupIncrementalQuery _))
}
