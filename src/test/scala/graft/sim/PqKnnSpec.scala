package graft.sim

import graft.SparkSpec

/** PQ + ADC shortlist + exact re-rank vs the exact brute-force top-k
  * (q30): on re-ranked candidates the emitted cosines are exact, so any
  * overlap is rank-faithful; recall measures how often the true
  * neighbors survive the quantized shortlist.
  */
class PqKnnSpec extends SparkSpec {
  import spark.implicits._

  test("PQ shortlist + re-rank recovers most exact top-5 neighbors") {
    val exact = SimQueries.q30KnnExact(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = PqKnn.pqKnn(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && pq.nonEmpty)
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.7, s"PQ recall@5 $recall below 0.7")
  }

  test("PQ output is deterministic across runs") {
    val a = PqKnn.pqKnn(spark, sf0001).collect()
    val b = PqKnn.pqKnn(spark, sf0001).collect()
    assert(a.sameElements(b))
  }
}
