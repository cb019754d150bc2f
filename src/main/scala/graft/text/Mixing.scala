package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus composition operators: domain mixing and benchmark
  * decontamination — the two gates between a curated corpus and a
  * training run.
  */
object Mixing {

  /** Deterministic weighted down-sampling per domain (here: language) —
    * "data mixing". Selection is a pure function of (doc_id, seed):
    * keep doc iff pmod(xxhash64(doc_id, seed), 10^6) < frac·10^6.
    * Unlike `sampleBy`/Bernoulli `sample` (whose per-partition RNG makes
    * the kept set depend on partition layout), a hash threshold yields
    * the SAME sample at any parallelism, supports reproducible
    * re-materialization, and needs no shuffle — it's a narrow filter.
    * Domains absent from `fractions` are dropped (fraction 0).
    */
  def domainMix(docs: DataFrame, domainCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (dom, f)) =>
      when(col(domainCol) === dom, lit(f)).otherwise(acc)
    }
    docs.filter(pmod(xxhash64(col("doc_id"), lit(seed)), lit(1000000L)) <
      frac * 1000000L)
  }

  /** Benchmark decontamination: per benchmark document, the fraction of
    * its word-3-gram shingles that appear ANYWHERE in the training
    * corpus. The corpus side is collapsed to DISTINCT shingle hashes
    * (8-byte keys — at 100 TB this is the big-but-linear side of one
    * semi-join keyed on the hash); the benchmark side is tiny by
    * definition. Docs with overlap ≥ `flagAt` are contaminated and must
    * be dropped from the corpus or the benchmark. EVERY benchmark doc
    * gets a verdict row; docs too short to shingle (< 3 tokens) carry
    * null overlap/contaminated — "unknown", not "clean" (the n-gram
    * method simply cannot judge them; screen them by exact match).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
      flagAt: Double = 0.8): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    def hashed(docs: DataFrame) =
      NearDup.shinglesOf(docs).as[(Long, Array[String])]
        .flatMap { case (id, sh) =>
          sh.iterator.map(x => (id, NearDup.hashShingle(x)))
        }.toDF("doc_id", "h")
    val corpusSh = hashed(corpus).select("h").distinct()
    // ONE pass over the benchmark shingles computes both counts: left
    // join against the distinct corpus hashes (multiplicity-safe) with a
    // match marker, then a single aggregate — no second tokenize scan
    val both = hashed(benchmark)
      .join(corpusSh.withColumn("__m", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__m")).as("n_matched"))
    // contaminated derives from the ROUNDED overlap so the emitted flag
    // always agrees with a consumer re-deriving it from the column
    benchmark.select(col("doc_id")).distinct()
      .join(both, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        when(col("n_shingles").isNotNull, col("n_matched")).as("n_matched"))
      .withColumn("overlap",
        round(col("n_matched").cast("double") /
          col("n_shingles").cast("double"), 4))
      .withColumn("contaminated", col("overlap") >= flagAt)
      .orderBy("doc_id")
  }

  /** Driver entries (rows-only): mix to a fixed lang recipe; treat docs
    * with doc_id ≡ 0 (mod 10) as the held-out benchmark and the rest as
    * the training corpus.
    */
  def domainMixQuery(s: SparkSession, d: String): DataFrame =
    domainMix(documents(s, d), "lang",
      Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.25, "zh" -> 0.25))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  def contaminationQuery(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    contamination(docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_domain_mix" -> (domainMixQuery _),
    "nq_contamination" -> (contaminationQuery _))
}
