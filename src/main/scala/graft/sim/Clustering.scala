package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding clustering as a first-class operator (SURVEY §2.K
  * similarity-search family) — the standalone form of the coarse
  * quantizer IVF trains internally: corpus segmentation, topic
  * bucketing, and dedup-by-centroid all start from "assign every
  * vector to a seeded k-means cluster and summarize the cells".
  *
  * Scale shape: MLlib KMeans is the distributed implementation (per-
  * partition partial sums, k×dim driver state — constant in the corpus
  * size); the assignment pass is one narrow map over the vectors; the
  * per-cluster summary is a hash aggregate on a k-cardinality key. At
  * 100 TB the only growing cost is the linear scans.
  *
  * Output: one row per cluster — size, mean within-cluster cosine to
  * the centroid (cohesion), and the cell's total inertia (raw sum of
  * squared distances; divide by the column's own sum for shares).
  * Seeded → deterministic; cross-run stability and k=16 < k=1 inertia
  * are pinned in ClusteringSpec. The iterative training is not
  * SQL-expressible, but the summary is: the query dumps its assignment
  * + centroid table during Verify and DuckDB recomputes the
  * per-cluster cos/sqdist summary on them (hard hash oracle since
  * round 10).
  */
object Clustering {

  def kmeansClusters(s: SparkSession, d: String, k: Int = 16): DataFrame = {
    val e = VecPrep.embeddingFeatures(s, d)
    // default k-means|| init here, unlike IvfKnn's random init: for the
    // standalone clustering operator the cluster quality IS the product
    val model = new KMeans().setK(k).setSeed(42).setFeaturesCol("v")
      .setPredictionCol("cluster").fit(e)
    val centroids = VecPrep.centroidTable(s, model)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cluster"))
    // Verify-only: the assignment + the trained centroid table, so the
    // oracle re-runs the SQL-expressible half — per-vector cos/sqdist
    // against the assigned centroid and the per-cluster summary — on
    // identical inputs; the iterative k-means fit stays engine-specific
    // (determinism/inertia specs)
    graft.OracleDump.dump(assigned.select(col("vec_id"), col("cluster")),
      s"${VecPrep.AnnOracleDir}/nq_kmeans_assign.parquet")
    graft.OracleDump.dump(centroids,
      s"${VecPrep.AnnOracleDir}/nq_kmeans_centroids.parquet")
    // one narrow pass: per-vector cosine + squared distance to its own
    // centroid (broadcast k rows), then a k-key hash aggregate
    assigned
      .join(broadcast(centroids), Seq("cluster"))
      .select(col("cluster"),
        (expr("vec_dot(embedding, centroid)") / (col("nrm") * col("cnorm")))
          .as("cos"),
        (expr("vec_dot(embedding, embedding)")
          - lit(2.0) * expr("vec_dot(embedding, centroid)")
          + col("cnorm") * col("cnorm")).as("sqdist"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg("cos"), 6).as("mean_cos"),
        round(sum("sqdist"), 4).as("inertia"))
      .orderBy("cluster")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_kmeans_clusters" -> ((s: SparkSession, d: String) =>
      kmeansClusters(s, d)))

  /** Per-cluster summary oracle over the dumped assignment + centroid
    * table. The SQL replicates the Spark side's EXACT arithmetic —
    * `list_dot_product` for the same sequential accumulation,
    * the dumped `cnorm` (not DuckDB's own norm), and the same
    * e·e − 2e·c + |c|² sqdist identity — so round-6/round-4 values
    * match rather than merely approximate. */
  val oracle: Map[String, String] = Map(
    "nq_kmeans_clusters" ->
      s"""WITH a AS (SELECT vec_id, cluster FROM read_parquet(
         |       '${VecPrep.AnnOracleDir}/nq_kmeans_assign.parquet/*.parquet')),
         |ct AS (SELECT cluster, centroid::DOUBLE[] AS c, cnorm
         |       FROM read_parquet(
         |       '${VecPrep.AnnOracleDir}/nq_kmeans_centroids.parquet/*.parquet')),
         |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |p AS (SELECT a.cluster,
         |        list_dot_product(v.e, ct.c)
         |          / (sqrt(list_dot_product(v.e, v.e)) * ct.cnorm) AS cos,
         |        list_dot_product(v.e, v.e)
         |          - 2 * list_dot_product(v.e, ct.c)
         |          + ct.cnorm * ct.cnorm AS sqdist
         |      FROM a JOIN v USING (vec_id) JOIN ct USING (cluster))
         |SELECT cluster, count(*) AS n_vecs,
         |  round(avg(cos), 6) AS mean_cos,
         |  round(sum(sqdist), 4) AS inertia
         |FROM p GROUP BY cluster ORDER BY cluster""".stripMargin)
}
