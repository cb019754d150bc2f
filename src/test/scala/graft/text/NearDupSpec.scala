package graft.text

import graft.SparkSpec
import graft.sim.LshKnn

/** Cross-checks the approximate near-dup/ANN paths against their exact
  * counterparts on the driver's sf0.001 tables.
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val exactPairs: Set[(Long, Long)] =
    TextQueries.q25NeardupJaccard(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("MLlib minhash candidates recover all exact jaccard>=0.1 pairs") {
    val mh = NearDup.minhashNeardup(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty, "fixture should contain planted near-dups")
    val missed = exactPairs -- mh
    assert(missed.isEmpty, s"minhash missed: $missed")
  }

  test("columnar minhash+verify equals the exact jaccard query") {
    // planted near-dups are all jaccard >= 0.9 (strong dups); the fast
    // path defaults to threshold 0.5 where b=16/r=4 banding catches with
    // probability ~1 — compare against the exact query at the same bar
    val exactStrong = TextQueries.q25NeardupJaccard(spark, sf0001)
      .filter($"jaccard" >= 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val fast = NearDup.minhashNeardupFast(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(fast == exactStrong,
      s"missed=${exactStrong -- fast} extra=${fast -- exactStrong}")
    assert(fast.nonEmpty)
  }

  test("incremental near-dup equals the full run restricted to new-batch pairs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val newIds = docs.filter($"doc_id" % 10 === 0)
      .select("doc_id").as[Long].collect().toSet
    val full = NearDup.minhashNeardupFast(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) =>
      newIds.contains(a) || newIds.contains(b) }
    val inc = NearDup.incrementalQuery(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(inc === expected,
      s"missing=${expected -- inc} extra=${inc -- expected}")
    assert(inc.nonEmpty, "fixture should have dups touching the new batch")
  }

  test("incremental from a persisted signature store equals the recompute run") {
    val docs = graft.Tables.documents(spark, sf0001)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore")
    val path = dir.resolve("signatures.parquet").toString
    try {
      NearDup.writeSignatureStore(corpus, path)
      val stored = NearDup
        .minhashNeardupIncrementalStored(spark, path, batch)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      val recomputed = NearDup.minhashNeardupIncremental(corpus, batch)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      assert(stored === recomputed,
        s"missing=${recomputed -- stored} extra=${stored -- recomputed}")
      assert(stored.nonEmpty)
      // a store written under different banding parameters joins on a
      // different hash family — must fail fast, not silently drop dups
      val ex = intercept[IllegalArgumentException] {
        NearDup.minhashNeardupIncrementalStored(spark, path, batch,
          nHashes = 32, rowsPerBand = 4)
      }
      assert(ex.getMessage.contains("band_sigs"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("simhash pairs are a subset of strong exact pairs") {
    val sh = NearDup.simhashNeardup(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // hamming<=3 on 64-bit simhash ⇒ high similarity ⇒ must appear in
    // the exact jaccard>=0.1 pair set
    val wrong = sh -- exactPairs
    assert(wrong.isEmpty, s"simhash false positives: $wrong")
    assert(sh.nonEmpty, "simhash should find the strongest planted dups")
  }

  test("sign-LSH near-dup recall vs exact cosine pairs") {
    val exact = graft.sim.SimQueries.q31EmbeddingNeardup(spark, sf0001)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val approx = LshKnn.lshNeardup(spark, sf0001)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9")
    // no false positives: LSH verifies the true distance, so approx ⊆ exact
    assert((approx -- exact).isEmpty)
  }

  test("approx_count_distinct within 5% of exact") {
    val exact = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("count(DISTINCT l_partkey) AS p", "count(DISTINCT l_suppkey) AS s")
      .as[(Long, Long)].head()
    val approx = graft.rel.ApproxQueries.approxDistinct(spark, sf0001)
      .selectExpr("sum(approx_parts)", "max(approx_supps)")
      .as[(Long, Long)].head()
    // per-group sums overcount shared keys; just bound the supp estimate
    assert(math.abs(approx._2 - exact._2).toDouble / exact._2 < 0.05)
  }
}
