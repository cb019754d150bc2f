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
  * are pinned in ClusteringSpec. Not SQL-expressible (iterative
  * training) → rows-only driver check.
  */
object Clustering {

  def kmeansClusters(s: SparkSession, d: String, k: Int = 16): DataFrame = {
    val e = VecPrep.embeddingFeatures(s, d)
    // default k-means|| init here, unlike IvfKnn's random init: for the
    // standalone clustering operator the cluster quality IS the product
    val model = new KMeans().setK(k).setSeed(42).setFeaturesCol("v")
      .setPredictionCol("cluster").fit(e)
    val centroids = VecPrep.centroidTable(s, model)
    // one narrow pass: per-vector cosine + squared distance to its own
    // centroid (broadcast k rows), then a k-key hash aggregate
    model.transform(e)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cluster"))
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
}
