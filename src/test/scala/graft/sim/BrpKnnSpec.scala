package graft.sim

import graft.SparkSpec
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** SURVEY §2.K similarity-search row names MLlib's
  * `BucketedRandomProjectionLSH.approxNearestNeighbors`; the engine's
  * production paths are the brute-force top-k (q30) and IVF/sign-LSH,
  * but the estimator API stays exercised and cross-checked here: on
  * unit vectors euclidean = sqrt(2−2cos), so BRP's nearest neighbors
  * must agree with the exact cosine ranking.
  */
class BrpKnnSpec extends SparkSpec {
  import spark.implicits._

  test("approxNearestNeighbors matches exact cosine top-k on unit vectors") {
    graft.functions.VecFunctions.register(spark)
    val raw = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("raw"),
        col("embedding"))
    val vecs = new Normalizer().setInputCol("raw").setOutputCol("unit")
      .setP(2.0).transform(raw)
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("hashes")
      .setBucketLength(1.0).setNumHashTables(6).setSeed(42)
      .fit(vecs)
    val query = vecs.orderBy("vec_id").head()
    val qid = query.getLong(0)
    val k = 5
    val ann = model
      .approxNearestNeighbors(vecs.filter(col("vec_id") =!= qid),
        query.getAs[org.apache.spark.ml.linalg.Vector]("unit"), k)
      .select("vec_id").as[Long].collect().toSet
    // exact cosine top-k via the codegen'd vec_dot
    val qe = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") === qid)
      .select(col("embedding").as("qe"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("qn"))
    val exact = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(qe))
      .select(col("vec_id"),
        (expr("vec_dot(embedding, qe)") /
          (sqrt(expr("vec_dot(embedding, embedding)")) * col("qn"))).as("cos"))
      .orderBy(col("cos").desc).limit(k)
      .select("vec_id").as[Long].collect().toSet
    assert(ann === exact, s"ann=$ann exact=$exact")
  }
}
