package graft.sim

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Shared embedding preparation for the k-means-based operators
  * (IvfKnn's coarse quantizer and the standalone Clustering operator) —
  * one definition so the two can't drift: the feature prep and the
  * centroid-table construction ARE the claim that the clustering
  * operator is "the standalone form of what IVF trains internally".
  */
private[sim] object VecPrep {

  /** (vec_id, embedding, v: MLlib vector, nrm: L2 norm) — the input
    * both k-means trainers fit on and both assignment passes scan.
    */
  def embeddingFeatures(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("v"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
  }

  /** k rows of (cluster, centroid: float array, cnorm) — tiny by
    * construction (k × dim), safe to broadcast everywhere.
    */
  def centroidTable(s: SparkSession, model: KMeansModel): DataFrame = {
    import s.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        (i, c.toArray.map(_.toFloat),
          math.sqrt(c.toArray.map(x => x * x).sum))
      }
      .toSeq.toDF("cluster", "centroid", "cnorm")
  }
}
