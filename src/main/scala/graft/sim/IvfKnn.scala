package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search — the
  * second scale path for q30's exact kNN (alongside BRP-LSH):
  *
  *  1. TRAIN: seeded Lloyd's k-means (`PqKnn.lloyd`) over a
  *     content-deterministic bounded sample → k coarse centroids (the
  *     quantizer; q32_label_centroids is the degenerate labeled form,
  *     and `Clustering.kmeansClusters` is the full-corpus MLlib
  *     operator when cluster QUALITY is the product). Sample training
  *     is the FAISS practice and the same round-10 move as IvfPq: a
  *     coarse quantizer only needs cells of roughly even mass, the
  *     model is k×dim KBs, and a full-corpus iterative fit per build
  *     bought ~25 jobs of overhead for nothing — recall is pinned by
  *     IvfKnnSpec either way.
  *  2. INDEX: assign every vector to its nearest centroid in ONE
  *     narrow pass — at rest this is a partition/cluster-by column, so
  *     a probe touches only nProbe/k of the data.
  *  3. SEARCH: route each query to its nProbe nearest centroids
  *     (tiny broadcast cross join), then exact cosine (codegen'd
  *     vec_dot) ONLY inside the probed cells, top-k per query.
  *
  * Seeded + hash-of-id sample → deterministic and layout-independent.
  */
object IvfKnn {

  def ivfKnn(s: SparkSession, d: String, k: Int = 16, nProbe: Int = 4,
      topK: Int = 5, nQueries: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val e = VecPrep.normed(s, d)
    val sample = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(2000).select("embedding").as[Seq[Float]]
      .collect().map(_.toArray)
    require(sample.nonEmpty, "ivfKnn: embeddings table is empty")
    val cents = PqKnn.lloyd(sample, k, iters = 10, seed = 42L)
    // materialized once: the final join reads this relation TWICE in one
    // action (the probe side embeds `queries` which derives from it, and
    // the candidate side scans it again) — without the truncation each
    // collect re-runs the scan + assignment twice. Same
    // checkpoint-not-cache rationale as IvfPq (see Checkpointing).
    val assignFn = udf((v: Seq[Float]) => IvfPq.nearestCell(v.toArray, cents))
    val assigned = graft.Checkpointing.truncate(
      e.select(col("vec_id"), col("embedding"), col("nrm"),
        assignFn(col("embedding")).as("cluster")))
    // centroid table: k rows of float arrays (broadcast everywhere)
    val centroids = VecPrep.centroidTable(s, cents)
    // probe routing: each query → nProbe nearest centroids by cosine
    // (dot / centroid norm — query norm is constant within a query's
    // ranking, but centroid norms vary and must be divided out)
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cdist").desc, col("cluster"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cdist", expr("vec_dot(qe, centroid)") / col("cnorm"))
      .withColumn("rp", row_number().over(wProbe))
      .filter(col("rp") <= nProbe)
      .select(col("query_id"), col("qe"), col("qn"), col("cluster"))
    // exact cosine inside probed cells only
    val cands = assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
    // Verify-only: the probed candidate pairs, so the oracle re-runs
    // the exact top-k tail on them (see VecPrep.AnnOracleDir)
    graft.OracleDump.dump(
      cands.select(col("query_id"), col("vec_id").as("cand_id")),
      s"${VecPrep.AnnOracleDir}/nq_ivf_knn.parquet")
    VecPrep.topKCosine(
      cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
          (expr("vec_dot(embedding, qe)") / (col("nrm") * col("qn")))
            .as("cos")),
      topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_ivf_knn" -> ((s: SparkSession, d: String) => ivfKnn(s, d)))

  /** Exact-re-rank oracle over the dumped probed-cell candidates. */
  val oracle: Map[String, String] = Map(
    "nq_ivf_knn" -> VecPrep.rerankOracleSql("nq_ivf_knn"))
}
