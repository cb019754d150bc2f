package graft.sim

import graft.SparkSpec

/** Seeded k-means clustering operator: deterministic output, full
  * coverage of the corpus, and actual clustering signal (k=16 must
  * explain more variance than the degenerate k=1).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans clusters are deterministic, cover the corpus, and reduce inertia") {
    val a = Clustering.kmeansClusters(spark, sf0001)
      .as[(Int, Long, Double, Double)].collect()
    val b = Clustering.kmeansClusters(spark, sf0001)
      .as[(Int, Long, Double, Double)].collect()
    assert(a.sameElements(b), "seeded k-means must be run-to-run stable")

    val nVecs = graft.Tables.embeddings(spark, sf0001).count()
    assert(a.map(_._2).sum === nVecs, "every vector assigned to a cluster")
    assert(a.length <= 16 && a.length > 1)

    val inertia16 = a.map(_._4).sum
    // k=1 baseline = total variance about the global mean (MLlib
    // rejects k<2, so compute it directly)
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val dim = vecs.head.length
    val mean = Array.tabulate(dim)(j => vecs.map(_(j)).sum / vecs.length)
    val inertia1 = vecs.map(v =>
      v.zip(mean).map { case (x, m) => (x - m) * (x - m) }.sum).sum
    assert(inertia16 < inertia1 * 0.9,
      s"k=16 inertia $inertia16 should be well under total variance $inertia1")
    // cohesion: cluster means must point toward their members
    assert(a.forall(_._3 > 0.0), "mean cosine to own centroid must be positive")
  }
}
