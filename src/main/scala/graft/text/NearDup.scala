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

  /** doc_id + distinct word-3-gram shingles (same shingling as q25). */
  private[graft] def shingles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t) - 3), " +
          "i -> concat_ws(' ', t[i], t[i + 1], t[i + 2]))")).as("shingles"))

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
    val votes = toks
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, 63), " +
          "b -> named_struct('b', b, 'v', " +
          "CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END))")).as("bv"))
      .groupBy(col("doc_id"), col("bv.b").as("b"))
      .agg(sum(col("bv.v")).as("vote"))
    val bits = votes
      .groupBy("doc_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(b, vote))), " +
          "x -> CASE WHEN x.vote > 0 THEN 1 ELSE 0 END)").as("bits"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_minhash_neardup" -> (minhashNeardup _),
    "nq_simhash_neardup" -> ((s: SparkSession, d: String) => simhashNeardup(s, d)))
}
