package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR selection: λ=1 degenerates to pure relevance order, the
  * diversity term steers pick 2 away from a near-copy of pick 1, ties
  * break to the smaller id, and the driver-collect cap fails loudly.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** (id, rel, embedding, nrm) candidates from unit-ish vectors. */
  private def cands(rows: (Long, Double, Array[Float])*) =
    rows.toSeq.map { case (id, rel, e) =>
      (id, rel, e, math.sqrt(e.map(x => x.toDouble * x).sum))
    }.toDF("id", "rel", "embedding", "nrm")

  private val ex = Array(1f, 0f)
  private val ey = Array(0f, 1f)
  private val exy = Array(0.9999f, 0.0141f) // ~ex, cosine ≈ 0.9999

  test("lambda = 1: MMR is exactly the relevance ranking") {
    val out = Mmr.mmrSelect(
        cands((1L, 0.9, ex), (2L, 0.7, ey), (3L, 0.8, exy)),
        k = 3, lambda = 1.0, oneMinusLambda = 0.0)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq === Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("diversity term: pick 2 skips the near-copy of pick 1") {
    // 3 is a near-copy of 1 with slightly lower rel: pure relevance
    // picks (1, 3, 2); MMR at lambda = 0.5 penalizes 3 by ~0.5 and
    // picks the orthogonal 2 second
    val out = Mmr.mmrSelect(
        cands((1L, 0.9, ex), (2L, 0.7, ey), (3L, 0.85, exy)),
        k = 2, lambda = 0.5, oneMinusLambda = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq === Seq((1, 1L), (2, 2L)))
  }

  test("mmr scores are the greedy recurrence's values") {
    val out = Mmr.mmrSelect(
        cands((1L, 0.9, ex), (2L, 0.7, ey)),
        k = 2, lambda = 0.7, oneMinusLambda = 0.3)
      .collect().map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L) == 0.7 * 0.9 - 0.3 * 0.0)
    assert(out(2L) == 0.7 * 0.7 - 0.3 * 0.0) // orthogonal: sim = 0
  }

  test("ties break to the smaller id") {
    val out = Mmr.mmrSelect(
        cands((7L, 0.5, ex), (3L, 0.5, ey)),
        k = 1, lambda = 1.0, oneMinusLambda = 0.0)
      .collect().map(_.getLong(1))
    assert(out.toSeq === Seq(3L))
  }

  test("k beyond the candidate count returns every candidate once") {
    val out = Mmr.mmrSelect(
        cands((1L, 0.9, ex), (2L, 0.7, ey)),
        k = 10, lambda = 0.7, oneMinusLambda = 0.3)
      .collect().map(_.getLong(1))
    assert(out.sorted.toSeq === Seq(1L, 2L))
  }

  test("the driver-collect cap fails loudly, not OOM") {
    val big = spark.range(0, 60)
      .select(col("id"), lit(0.5).as("rel"),
        array(lit(1f), lit(0f)).as("embedding"), lit(1.0).as("nrm"))
    val e = intercept[IllegalArgumentException] {
      Mmr.mmrSelect(big, k = 5, lambda = 0.7, oneMinusLambda = 0.3,
        maxCandidates = 50)
    }
    assert(e.getMessage.contains("shortlist"))
  }

  test("contract entry: 10 distinct picks, pick 1 is the top-relevance " +
      "candidate, every pick is from the 40-candidate shortlist") {
    val out = Mmr.nqMmrSelect(spark, sf0001).collect()
    assert(out.length == 10)
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == 10)
    assert(out.map(_.getInt(0)).toSeq == (1 to 10))
    // rank-1 pick maximizes bare relevance (empty selected set)
    assert(out.head.getDouble(2) == out.map(_.getDouble(2)).max)
  }
}
