package graft.sim

import graft.SparkSpec

/** IVF-PQ composite: pruned-to-probed-cells ADC over residual codes,
  * exact re-rank. Recall is capped by probe coverage (the structureless
  * test embeddings are IVF's worst case — a true neighbor in an
  * unprobed cell is unreachable), so the floor matches IvfKnnSpec's.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("IVF-PQ recall vs exact, bounded by probed-cell coverage") {
    val exact = SimQueries.q30KnnExact(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = IvfPq.ivfPqKnn(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50)
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall")
    assert(got.size == 50, "5 results per query")
  }

  test("IVF-PQ output is deterministic across runs") {
    val a = IvfPq.ivfPqKnn(spark, sf0001).collect()
    val b = IvfPq.ivfPqKnn(spark, sf0001).collect()
    assert(a.sameElements(b))
  }
}
