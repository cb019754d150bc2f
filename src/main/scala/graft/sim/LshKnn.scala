package graft.sim

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Approximate nearest-neighbor search: the scale path for q30/q31.
  *
  * Unit-normalize embeddings, then bucketed random projection LSH —
  * on unit vectors, euclidean distance dist = sqrt(2 − 2·cos), so a
  * cosine floor maps to a distance ceiling and approxSimilarityJoin
  * only materializes bucket-colliding pairs. At cluster scale the join
  * shuffles on (hash-table, bucket) keys; no quadratic blow-up.
  * Seeded → deterministic. Rows-only driver check; recall vs the exact
  * q31 pairs is asserted in the test suite.
  */
object LshKnn {

  private def unitVecs(s: SparkSession, d: String): DataFrame = {
    val raw = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding")).as("raw"))
    new Normalizer().setInputCol("raw").setOutputCol("unit").setP(2.0)
      .transform(raw)
      .select(col("vec_id"), col("label"), col("unit"))
  }

  /** Near-dup pairs with cosine ≥ minCos (default 0.4, matching q31). */
  def lshNeardup(s: SparkSession, d: String, minCos: Double = 0.4): DataFrame = {
    val vecs = unitVecs(s, d)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("hashes")
      .setBucketLength(1.0).setNumHashTables(6).setSeed(42)
    val model = lsh.fit(vecs)
    val maxDist = math.sqrt(2.0 - 2.0 * minCos)
    model.approxSimilarityJoin(vecs, vecs, maxDist, "dist")
      .filter(col("datasetA.vec_id") < col("datasetB.vec_id"))
      .select(col("datasetA.vec_id").as("id1"),
        col("datasetB.vec_id").as("id2"),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cosine"))
      .filter(col("cosine") >= minCos)
      .orderBy("id1", "id2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_lsh_neardup" -> ((s: SparkSession, d: String) => lshNeardup(s, d)))
}
