package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 40 well-separated base vectors + planted near-twins of the first
    * 5 (tiny perturbation → cosine ≈ 1). Base vectors are random on the
    * 16-sphere — with high probability no two exceed the 0.97 threshold.
    */
  private def fixture(): org.apache.spark.sql.DataFrame = {
    val rnd = new Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0L until 40L).map(i => (i, unit()))
    val twins = base.take(5).map { case (i, v) =>
      // nudge one coordinate slightly: cosine stays ≈ 0.999
      (100L + i, v.updated(0, v(0) + 0.01f))
    }
    (base ++ twins).toDF("id", "emb")
  }

  test("planted near-twins drop, their lower-id originals survive") {
    val out = SemDedup.semanticDedup(fixture(), "id", "emb", k = 4)
      .as[(Long, String, Boolean)].collect()
    assert(out.length === 45)
    val dup = out.filter(_._3).map(_._1).toSet
    // every planted twin (ids 100..104) is flagged; every original kept
    assert((100L to 104L).forall(dup.contains), s"twins not all flagged: $dup")
    assert((0L until 40L).forall(id => !dup.contains(id)),
      s"false positives among originals: ${dup.filter(_ < 40)}")
    // twin and original landed in the same cluster (else the pair could
    // never have been scored)
    val cl = out.map(r => r._1 -> r._2).toMap
    (0L until 5L).foreach(i => assert(cl(i) === cl(100L + i)))
  }

  test("verdicts are deterministic across repeated runs on the same input") {
    // NOT asserted across repartition: MLlib's seeded k-means init
    // samples per partition, so the trained centers — and with them
    // boundary assignments — legitimately depend on the input layout
    // (documented in SemDedup's scaladoc). Same layout => same verdicts.
    val a = SemDedup.semanticDedup(fixture(), "id", "emb", k = 4)
      .as[(Long, String, Boolean)].collect().toSet
    val b = SemDedup.semanticDedup(fixture(), "id", "emb", k = 4)
      .as[(Long, String, Boolean)].collect().toSet
    assert(a === b)
  }

  test("a planted mega-cluster splits: leaf sizes bounded, twins still drop") {
    // 240 vectors bunched around one direction (|u| ≈ 4, σ=0.9 noise →
    // pairwise cosine ≈ 0.55, far below the 0.97 threshold, so NONE are
    // semantic dups) + 40 scattered vectors + one true near-twin
    // planted in the bunch.
    val rnd = new Random(11)
    def noisy(u: Array[Double], sigma: Double): Array[Float] = {
      val v = u.map(x => x + sigma * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val u = Array.fill(16)(rnd.nextGaussian())
    val blob = (0L until 240L).map(i => (i, noisy(u, 0.9)))
    val scattered = (1000L until 1040L).map { i =>
      (i, noisy(Array.fill(16)(rnd.nextGaussian()), 0.0))
    }
    val twinOf0 = (5000L, blob.head._2.updated(0, blob.head._2(0) + 0.01f))
    val df = (blob ++ scattered :+ twinOf0).toDF("id", "emb")

    val cap = 40L
    val out = SemDedup.semanticDedup(df, "id", "emb",
      k = 4, sizeCap = cap).cache()
    val leafSizes = out.groupBy("cluster").count()
      .as[(String, Long)].collect().map(_._2)
    // with k=4 over 281 rows some root cluster must exceed cap=40; the
    // recursive re-fit has to bring every leaf under ~2×cap — the bound
    // that keeps Σ n_c² ≈ n·cap instead of the unsplit quadratic
    assert(out.select("cluster").distinct().count() > 4,
      "no cluster was ever split despite cap < n/k")
    assert(leafSizes.max <= 2 * cap,
      s"oversized leaf survived the recursive split: ${leafSizes.max}")
    val pairVolume = leafSizes.map(s => s * s).sum
    assert(pairVolume < 281L * 281L / 4,
      s"pair volume $pairVolume not meaningfully below unsplit quadratic")
    // semantics survive the splitting: the one true twin drops, and the
    // bunched-but-not-duplicate vectors all survive
    val dup = out.filter($"is_dup").as[(Long, String, Boolean)]
      .collect().map(_._1).toSet
    assert(dup === Set(5000L),
      s"expected exactly the planted twin to drop, got $dup")
    out.unpersist()

    // incremental under the same bounded tree: a batch twin of a blob
    // member drops, a fresh vector survives
    val tree = SemDedup.fitCorpus(df, "id", "emb", k = 4, sizeCap = cap)
    val fresh = noisy(Array.fill(16)(rnd.nextGaussian()), 0.0)
    val batch = Seq(
      (9000L, blob(7)._2.updated(1, blob(7)._2(1) + 0.01f)),
      (9001L, fresh)).toDF("id", "emb")
    val inc = SemDedup.semanticDedupIncremental(
      SemDedup.assign(tree, df, "id", "emb"),
      SemDedup.assign(tree, batch, "id", "emb"))
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(inc(9000L), "batch twin of a corpus blob member must drop")
    assert(!inc(9001L), "fresh batch vector must survive")
  }

  test("cluster tree round-trips through its parquet store, verdicts identical") {
    val rnd = new Random(21)
    def noisy(u: Array[Double], sigma: Double): Array[Float] = {
      val v = u.map(x => x + sigma * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val u = Array.fill(16)(rnd.nextGaussian())
    // bunch large enough to force a split under cap=20 → depth-2 tree
    val blob = (0L until 120L).map(i => (i, noisy(u, 0.9)))
    val scattered = (1000L until 1020L).map { i =>
      (i, noisy(Array.fill(16)(rnd.nextGaussian()), 0.0))
    }
    val df = (blob ++ scattered).toDF("id", "emb")
    val tree = SemDedup.fitCorpus(df, "id", "emb", k = 3, sizeCap = 20L)
    assert(tree.children.nonEmpty, "fixture must produce a split tree")
    val dir = java.nio.file.Files.createTempDirectory("semtree")
    try {
      val path = dir.resolve("tree.parquet").toString
      SemDedup.writeTree(spark, tree, path)
      val loaded = SemDedup.readTree(spark, path)
      val a = SemDedup.assign(tree, df, "id", "emb")
        .select("id", "cluster").as[(Long, String)].collect().sortBy(_._1)
      val b = SemDedup.assign(loaded, df, "id", "emb")
        .select("id", "cluster").as[(Long, String)].collect().sortBy(_._1)
      assert(a.toSeq === b.toSeq,
        "assignments under the loaded tree must be identical")
      // a missing store fails loudly (Spark's PATH_NOT_FOUND)
      intercept[Exception] {
        SemDedup.readTree(spark,
          dir.resolve("missing.parquet").toString)
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("incremental: batch verdicts against a standing corpus, corpus never self-scored") {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpus = fixture() // ids 0..39 + planted twins 100..104
    val model = new KMeans().setK(4).setSeed(42).setFeaturesCol("v")
      .setPredictionCol("cluster")
      .fit(corpus.select(array_to_vector($"emb").as("v")))
    val corA = SemDedup.assign(model, corpus, "id", "emb")
    // batch: a twin of corpus id 10 (drops), a twin of ITSELF (the
    // lower batch id survives unless it twins the corpus; 201 drops
    // against 200), and a fresh vector (survives)
    val rnd = new Random(99)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val corpusVec10 = corpus.filter($"id" === 10L)
      .select("emb").as[Array[Float]].head()
    val freshA = unit()
    val batch = Seq(
      (200L, corpusVec10.updated(0, corpusVec10(0) + 0.01f)),
      (201L, corpusVec10.updated(1, corpusVec10(1) + 0.01f)),
      (300L, freshA),
      (301L, freshA.updated(0, freshA(0) + 0.01f))
    ).toDF("id", "emb")
    val batA = SemDedup.assign(model, batch, "id", "emb")
    val out = SemDedup.semanticDedupIncremental(corA, batA)
      .as[(Long, Int, Boolean)].collect()
      .map { case (k, _, d) => k -> d }.toMap
    assert(out(200L), "twin of corpus id 10 must drop")
    assert(out(201L), "also a twin of corpus id 10 (and of 200) -> drops")
    assert(!out(300L), "fresh vector must survive")
    assert(out(301L), "intra-batch twin of lower id 300 must drop")
    assert(out.size === 4, "verdicts are for the batch only, never the corpus")
  }

  test("contract entry runs on the embeddings table with sane shape") {
    val out = SemDedup.semanticDedupQuery(spark, sf0001).cache()
    val n = graft.Tables.embeddings(spark, sf0001).count()
    assert(out.count() === n)
    assert(out.columns.toSeq === Seq("vec_id", "cluster", "is_dup"))
    // keepers must cover every cluster that has any vectors
    val clustersAll = out.select("cluster").distinct().count()
    val clustersKept = out.filter(!$"is_dup").select("cluster")
      .distinct().count()
    assert(clustersKept === clustersAll)
    // dedup is conservative on this near-uniform corpus: dropping more
    // than half the vectors at 0.97 would mean the threshold is broken
    assert(out.filter($"is_dup").count() < n / 2)
    out.unpersist()
  }
}
