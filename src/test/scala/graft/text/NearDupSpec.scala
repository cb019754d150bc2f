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
      assert(ex.getMessage.contains("nHashes"))
      // QUOTIENT-COLLIDING params: (32,2) yields the same 16 bands as
      // the store's (64,4) but a different minhash family — a
      // band-count check passes vacuously; the embedded exact-params
      // check must still fail fast
      val exQ = intercept[IllegalArgumentException] {
        NearDup.minhashNeardupIncrementalStored(spark, path, batch,
          nHashes = 32, rowsPerBand = 2)
      }
      assert(exQ.getMessage.contains("nHashes"))
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

  test("whitespace padding never changes a doc's shingle set") {
    // Java split keeps a LEADING empty token (" a b c" → ["","a","b","c"])
    // and drops trailing ones — without the explicit empty filter the
    // padded variants would shingle differently from the clean text AND
    // diverge from the DuckDB oracles' list_filter'd tokenization
    val variants = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, " alpha beta gamma delta"),
      (3L, "alpha beta gamma delta "),
      (4L, "  alpha  beta\tgamma \n delta  "))
    val sh = NearDup.shinglesOf(variants.toDF("doc_id", "text"))
      .as[(Long, Array[String])].collect()
      .map { case (id, a) => id -> a.toSet }.toMap
    assert(sh(1L) === Set("alpha beta gamma", "beta gamma delta"))
    variants.map(_._1).foreach { id =>
      assert(sh(id) === sh(1L), s"doc $id padded variant diverged")
    }
  }

  test("redelivered doc on both incremental sides: no self-pairs, no duplicate rows") {
    val dup = "the quick brown fox jumps over the lazy dog once again today"
    val other = "completely different words with entirely unrelated content flowing here"
    val corpus = Seq((1L, dup), (2L, other)).toDF("doc_id", "text")
    // doc 1 is redelivered in the new batch (at-least-once source), and
    // doc 3 is a genuine near-dup of it
    val batch = Seq((1L, dup), (3L, dup + " x")).toDF("doc_id", "text")
    val got = NearDup.minhashNeardupIncremental(corpus, batch)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(!got.exists(p => p._1 == p._2),
      s"degenerate self-pair emitted: ${got.toSeq}")
    assert(got.length === got.distinct.length,
      s"duplicate pair rows emitted: ${got.toSeq}")
    assert(got.contains((1L, 3L)), s"real pair (1,3) missing: ${got.toSeq}")
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
