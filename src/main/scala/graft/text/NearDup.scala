package graft.text

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Sub-quadratic near-duplicate detection: MinHash+LSH and SimHash.
  * These are the 100 TB-scale paths for what q25_neardup_jaccard computes
  * exactly — candidate generation is a bucket equi-join (shuffle keyed on
  * band/bucket), never an all-pairs product. Not SQL-expressible →
  * rows-only driver check; SimHash/MinHash agreement with the exact
  * jaccard query is asserted in the test suite instead.
  */
object NearDup {

  /** doc_id + distinct word-3-gram shingles (same shingling as q25).
    *
    * Typed map, not `transform(sequence(...))` + `explode`: the
    * expression route re-evaluates the generator chain per emitted row
    * (measured 11.7 s vs 0.5 s at sf0.1 for identical output) because the
    * HOF lambda escapes whole-stage codegen and projection collapse
    * inlines the split under it. The typed path tokenizes once per doc.
    */
  private[graft] def shingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val t = text.split("\\s+")
        val sh =
          if (t.length < 3) Array.empty[String]
          else Array.tabulate(t.length - 2)(i =>
            t(i) + " " + t(i + 1) + " " + t(i + 2)).distinct
        (id, sh)
      }.toDF("doc_id", "shingles")
  }

  // ------------------------------------------------- MinHash + LSH
  // shingle set → sparse vector (HashingTF over 2^18 buckets) → MinHash
  // signatures → LSH banding (numHashTables OR-amplification) →
  // approxSimilarityJoin emits only bucket-colliding candidate pairs with
  // exact-on-signature jaccard distance. Seeded → deterministic.
  def minhashNeardup(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d)
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(sh).filter(size(col("shingles")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, 0.9, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("d1"),
        col("datasetB.doc_id").as("d2"),
        round(lit(1.0) - col("jaccard_dist"), 4).as("jaccard_est"))
      .orderBy("d1", "d2")
  }

  // ------------------------------------------------- SimHash
  // 64-bit SimHash, fully in DataFrame expressions:
  //   token → xxhash64 → per-bit ±1 votes → sign of per-bit sums → 4
  //   16-bit bands. Candidates = pairs sharing ≥1 band (equi-join on
  //   (band_idx, band_value)); verified by exact Hamming distance over
  //   the 64-bit sign vector. Everything shuffles on small integer keys.
  def simhashNeardup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    // per-doc 64-bit sign vector, as array<int> of 0/1, bit 0 first.
    // Hash word-3-gram shingles, not unigrams: the corpus vocabulary is
    // tiny, so unigram profiles collide; shingles carry word order.
    val toks = shingles(s, d)
      .select(col("doc_id"), explode(col("shingles")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // 64 per-bit ±1 vote sums as ONE 64-column aggregate (no tokens×64
    // row explosion — at scale that factor is the whole shuffle volume)
    val voteCols = (0 until 64).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"v$b"))
    val bits = toks.groupBy("doc_id")
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 64).map(b =>
          when(col(s"v$b") > 0, 1).otherwise(0)): _*).as("bits"))
    // 16-bit bands for candidate generation
    val banded = bits.select(col("doc_id"), col("bits"), explode(expr(
      "transform(sequence(0, 3), band -> named_struct('band', band, " +
        "'bv', aggregate(sequence(0, 15), 0, " +
        "(acc, j) -> acc + bits[band * 16 + j] * CAST(pow(2, j) AS INT))))"))
      .as("bb"))
      .select(col("doc_id"), col("bits"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.bits").as("bits1"), col("b.bits").as("bits2"))
      .dropDuplicates("d1", "d2")
    cands
      .select(col("d1"), col("d2"), expr(
        "aggregate(zip_with(bits1, bits2, (x, y) -> abs(x - y)), 0, " +
          "(acc, v) -> acc + v)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  // ------------------------------------------------- columnar MinHash
  // Pure-DataFrame MinHash near-dup: stays in whole-stage codegen end to
  // end (no Vector materialization, unlike the MLlib variant — measured
  // ~20× faster on the same data):
  //   1. one shuffle: per-doc signature = 64 min(xxhash64(shingle, salt))
  //      aggregates computed in a single groupBy pass;
  //   2. candidate pairs = docs sharing any banded signature — b=16
  //      bands of r=4 rows (P(catch) = 1-(1-j⁴)^16: ≈1.0 at j≥0.8,
  //      0.64 at j=0.5, while j≈0.01 noise pairs essentially never
  //      collide → the candidate set stays ~linear in the true dups, the
  //      property that makes this run at 100 TB);
  //   3. exact jaccard verification ONLY on candidates via plain
  //      equi-joins on doc_id — emitted pairs are exact, not estimates.
  def minhashNeardupFast(s: SparkSession, d: String, nHashes: Int = 64,
      rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(nHashes % rowsPerBand == 0, "nHashes must divide into bands")
    val nBands = nHashes / rowsPerBand
    // hash every shingle once to a LONG — all downstream work (minhash,
    // banding, verification) is integer-keyed, never re-touching strings
    val hashed = shingles(s, d)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    // ONE aggregation pass builds both the min-hash signatures and the
    // per-doc sorted hash set used for exact verification
    val sigCols = (0 until nHashes).map(k =>
      min(xxhash64(col("h"), lit(k))).as(s"m$k"))
    val mh = hashed.groupBy("doc_id")
      .agg(sort_array(collect_set("h")).as("hs"), sigCols: _*)
      .withColumn("sz", size(col("hs")))
      .cache() // reused by banding AND verification below
    val bandSigs = (0 until nBands).map { b =>
      xxhash64((0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }
    val bands = mh.select(col("doc_id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "sig")))
    val cands = bands.as("ba").join(bands.as("bb"),
        col("ba.band") === col("bb.band") && col("ba.sig") === col("bb.sig") &&
          col("ba.doc_id") < col("bb.doc_id"))
      .select(col("ba.doc_id").as("d1"), col("bb.doc_id").as("d2"))
      .distinct()
    // verify on the candidate set only. Deliberately NOT broadcast: the
    // per-doc hash-set relation grows with the corpus, so a broadcast
    // here OOMs the driver at 100 TB by construction. Plain shuffle
    // equi-joins on doc_id scale linearly, and AQE demotes them to
    // broadcast automatically whenever the side is actually small.
    val docSets = mh.select(col("doc_id"), col("hs"), col("sz"))
    cands
      .join(docSets.as("za"), col("d1") === col("za.doc_id"))
      .join(docSets.as("zb"), col("d2") === col("zb.doc_id"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("za.hs"), col("zb.hs"))).as("n_inter"),
        col("za.sz").as("sz1"), col("zb.sz").as("sz2"))
      .select(col("d1"), col("d2"),
        (col("n_inter").cast("double") /
          (col("sz1") + col("sz2") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("d1", "d2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_minhash_neardup" -> ((s: SparkSession, d: String) => minhashNeardupFast(s, d)),
    "nq_minhash_mllib" -> (minhashNeardup _),
    "nq_simhash_neardup" -> ((s: SparkSession, d: String) => simhashNeardup(s, d)))
}
