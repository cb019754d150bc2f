package graft.sim

import graft.SparkSpec

class IvfKnnSpec extends SparkSpec {
  import spark.implicits._

  test("IVF kNN recall vs exact brute force") {
    val exact = SimQueries.q30KnnExact(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfKnn.ivfKnn(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50)
    val recall = (exact & ivf).size.toDouble / exact.size
    // random-ish embeddings are a worst case for IVF (no cluster
    // structure); nProbe=4 of k=16 should still recover well over half
    assert(recall >= 0.5, s"IVF recall $recall")
    // every returned neighbor must come from a probed cell — sanity: 5
    // results per query
    assert(ivf.size == 50)
  }
}
