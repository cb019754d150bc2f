package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Training-run data preparation: the deterministic global shuffle that
  * turns a curated corpus into shard files, and the bigram LM table —
  * the two steps between "curated corpus" and "tokens on a trainer".
  *
  * The reference's pipeline covers the generation side (SURVEY §2.B);
  * these are the §2.K extensions a 100 TB text pipeline needs on top.
  */
object TrainPrep {

  /** Deterministic distributed shuffle + shard assignment — the survey's
    * G3 "seeded shuffle" expressed the way a cluster actually does it.
    * `sample`/`rand(seed)`-based shuffles are partition-layout-dependent
    * (per-partition RNG streams), so two runs over differently-split
    * input produce different epochs; a hash of the stable row id is a
    * pure function of the data:
    *
    *   shard = pmod(xxhash64(id, seed), nShards)
    *   pos   = rank of the hash within the shard (ties on id)
    *
    * Scale shape: ONE shuffle keyed on shard, then a per-shard sort
    * (Spark's window sorts within the hash partition; external sort
    * spills, never OOMs). Parallelism = nShards — at 100 TB you pick
    * nShards ≈ the trainer's file count (thousands), so every core sorts
    * one shard-sized run. No global total sort, no driver involvement.
    * Re-running with a new seed re-deals every row: hash bits, not
    * physical order, carry the randomness.
    */
  def shuffleShard(docs: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    docs
      .select(col(idCol), xxhash64(col(idCol), lit(seed)).as("hkey"))
      .withColumn("shard", pmod(col("hkey"), lit(nShards.toLong)))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy(col("hkey"), col(idCol)))
        .cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Materialize [[shuffleShard]]'s deal as the trainer-facing shard
    * FILES: one `shard=N/` directory per shard, rows in `pos` order
    * inside — the layout a data loader streams sequentially while the
    * hash bits (not file order) carry the epoch's randomness. A new
    * seed re-deals and rewrites; the write is one shard-keyed exchange
    * plus a per-task sort (each task sorts only its own shards, spills
    * to disk — never a global total sort). `maxRecordsPerFile` > 0
    * caps file sizes for loaders that want bounded units; the
    * sequentially-numbered part files within a shard directory keep
    * `pos` order under lexicographic name sort.
    */
  def exportShards(docs: DataFrame, idCol: String, path: String,
      nShards: Int, seed: Long = 42L, maxRecordsPerFile: Long = 0L): Unit =
    // ONE full-row exchange + one input scan (r18 review): the
    // previous docs ⋈ shuffleShard(docs) form re-scanned the corpus
    // and paid a corpus-wide doc_id join plus a SECOND full-row
    // shuffle. hkey/shard/pos are pure functions of the id
    // (shuffleShard's exact expressions), so they compute inline; the
    // pos window reuses the shard repartition's exchange, and its
    // task sort (shard, hkey, id) IS the written pos order the
    // loaders stream.
    // null ids drop (r19 ADVICE): xxhash64(null) degrades to the seed
    // hash, so every null-id row would land in ONE shard and the
    // row_number tie on (hkey, null) would deal them a
    // NONDETERMINISTIC pos across runs — shard files must be
    // re-materializable bit-for-bit. (The pre-r18 docs⋈shuffleShard
    // form silently dropped them through its equi-join; this makes
    // the drop explicit.)
    docs
      .filter(col(idCol).isNotNull)
      .withColumn("hkey", xxhash64(col(idCol), lit(seed)))
      .withColumn("shard", pmod(col("hkey"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard")
          .orderBy(col("hkey"), col(idCol)))
        .cast("long"))
      .drop("hkey")
      .write.partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)

  /** Bigram language-model table over the corpus: per (w1, w2) the raw
    * count and the conditional probability P(w2|w1) — the classic
    * count-based LM / corpus-statistics aggregate (and the shape of any
    * n-gram count job: Brants et al., "Large Language Models in Machine
    * Translation", EMNLP 2007 runs exactly this at web scale).
    *
    * Scale shape: bigrams are built per row with a narrow array
    * expression (transform over the token list — NO posexplode window,
    * no per-doc shuffle), then ONE groupBy keyed on the bigram. The
    * conditional denominator is a window sum over w1 on the already
    * aggregated table, whose size is bounded by vocab² — independent of
    * corpus size, so the second shuffle is O(vocab²) however big the
    * input is.
    */
  def bigramLm(docs: DataFrame): DataFrame = {
    docs
      // the SHARED tokenize/bigram exprs (r18 review: this builder
      // carried its own inline copies of toksColumn/bigramsColumn —
      // the q66 table must provably share the scorer's bigram shape;
      // element_at is 1-based, lambda i 0-based over the n-1 slice,
      // so (x, i) pairs t[i+1] with t[i+2])
      .select(toksColumn.as("t"))
      .select(explode(bigramsColumn).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum("n").over(Window.partitionBy("w1")), 4))
      .orderBy("w1", "w2")
  }

  /** Merge bigram LM tables trained on disjoint corpus slices. Counts
    * are additive — the property that makes count-based LMs scale
    * (Brants et al. count per shard and merge) and makes the table
    * incrementally maintainable: a new corpus batch is counted alone
    * and merged in, never re-scanning old corpora. Conditionals are
    * recomputed from the merged counts, so the result is EXACTLY the
    * whole-corpus table (same integers → same doubles → same rounding;
    * the q72 contract entry rides q66's oracle to re-prove that every
    * round). Cost is re-aggregation of vocab²-bounded tables —
    * independent of corpus size.
    */
  def bigramLmMerge(lms: Seq[DataFrame]): DataFrame = {
    require(lms.nonEmpty, "bigramLmMerge needs at least one LM table")
    lms.map(_.select(col("w1"), col("w2"), col("n")))
      .reduce(_ unionAll _)
      .groupBy("w1", "w2").agg(sum("n").as("n"))
      .withColumn("p",
        round(col("n") / sum("n").over(Window.partitionBy("w1")), 4))
      .orderBy("w1", "w2")
  }

  /** LM quality scoring — APPLY a bigram LM table to a corpus: per doc,
    * the bigram count and the average negative log-likelihood under the
    * LM (the log of perplexity). This is the CCNet-style quality filter
    * (Wenzek et al. 2020 score docs against a reference-corpus KenLM
    * and keep the low-perplexity tail; q66's bigram table stands in for
    * KenLM here), completing the pair: q66 TRAINS the table, this
    * consumes it.
    *
    * Bigrams absent from the LM — and LM probabilities that ROUNDED to
    * zero (q66 rounds p to 4 digits, so a < 0.00005 conditional would
    * otherwise yield ln(0)) — are clamped to `floorP` before the log:
    * greatest(coalesce(p, floor), floor) in both engines.
    *
    * Scale shape: doc bigrams are the same narrow per-row transform as
    * q66 (no posexplode window); the score is one equi-join on the
    * bigram key against a vocab²-bounded LM table (unhinted — AQE
    * broadcasts it while it fits, SMJ beyond) and one groupBy doc_id
    * with map-side combine. Nothing is corpus × corpus.
    */
  /** Shared tokenize + adjacent-bigram exprs — one definition so the
    * batch scorer and the streaming ingest gate provably build the
    * same bigrams. */
  private[graft] val toksColumn =
    filter(split(col("text"), "\\s+"), t => t =!= "")
  private[graft] val bigramsColumn = expr(
    "transform(slice(t, 1, greatest(size(t) - 1, 0)), " +
      "(x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))")
  /** The per-bigram negative log likelihood with the unseen-bigram
    * floor; null for a null bigram row (explode_outer padding). */
  private[graft] def nllColumn(floorP: Double) =
    when(col("w1").isNotNull,
      -log(greatest(coalesce(col("p"), lit(floorP)), lit(floorP))))

  def lmScore(docs: DataFrame, lm: DataFrame,
      floorP: Double = 1e-4): DataFrame = {
    // explode_outer keeps docs too short to bigram (< 2 tokens, or null
    // text) as ONE null-bigram row instead of dropping them and joining
    // the doc list back afterwards (r19, guide §2.4): the old tail was a
    // second corpus scan + a doc-keyed join of the whole output just to
    // re-attach null scores. nullif reproduces the join's null n_bigrams
    // for those docs (count of a non-null w1 would say 0); nllColumn is
    // already null on the padding row, so avg_nll stays null. Scored
    // docs see identical rows either way — output bit-identical.
    val bgs = docs
      .select(col("doc_id"), toksColumn.as("t"))
      .select(col("doc_id"), explode_outer(bigramsColumn).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    bgs
      .join(lm.select(col("w1"), col("w2"), col("p")), Seq("w1", "w2"), "left")
      .groupBy("doc_id")
      .agg(nullif(count(col("w1")), lit(0L)).as("n_bigrams"),
        round(avg(nllColumn(floorP)), 4).as("avg_nll"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): documents split into head/middle/tail by the terciles of
    * their LM score WITHIN their language, so quality thresholds are
    * language-fair (an absolute threshold would drop whole low-resource
    * languages whose scores skew high). Input is (doc_id, lang, avg_nll);
    * lower avg_nll = more fluent = head.
    *
    * Bucket assignment is the explicit integer rank form
    * `(3·(r−1)) div n` (r = rank by (avg_nll, doc_id), n = language
    * size) rather than `ntile(3)` — the formula is unambiguous and
    * engine-independent, where ntile's remainder convention is a trap to
    * cross-check. Unscored docs (null avg_nll — too short to bigram)
    * keep their row with a null bucket: "unknown", not "tail".
    *
    * Scale: the exact rank needs a per-language total order — ONE
    * reducer per language, fine for bounded language counts but wrong
    * when one language IS most of the corpus. This exact form is the
    * correctness backstop (and the oracle, q77); the 100 TB path is
    * [[ccnetBucketsApprox]]: mergeable GK threshold sketches per
    * language (map-side partials, no total order), thresholds broadcast,
    * assignment a narrow compare at scan speed — the same
    * exact-backstop/approx-scale pairing as q39 vs nq_approx_percentiles.
    */
  def ccnetBuckets(scoredLang: DataFrame): DataFrame = {
    // ONE window pass, no self-join: nulls sort LAST so scored rows get
    // ranks 1..n (n = count of NON-null scores via count(col)), and the
    // null-score rows keep their bucket-null verdict directly. The
    // previous filter + join-back formulation evaluated the whole
    // upstream LM-scoring pipeline TWICE (once per join branch) — at
    // 100 TB that is two corpus scans and an extra doc_id shuffle for a
    // row-local decision.
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_nll").asc_nulls_last, col("doc_id").asc)
    scoredLang
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("n",
        count(col("avg_nll")).over(Window.partitionBy("lang")).cast("long"))
      .withColumn("bucket",
        when(col("avg_nll").isNull, lit(null).cast("string")).otherwise(expr(
          "CASE (3 * (r - 1)) DIV n WHEN 0 THEN 'head' " +
            "WHEN 1 THEN 'middle' ELSE 'tail' END")))
      .select("doc_id", "lang", "avg_nll", "bucket")
  }

  /** The 100 TB form of [[ccnetBuckets]]: per-language tercile
    * THRESHOLDS from `percentile_approx` (a mergeable GK sketch —
    * map-side partials, output one row per language), broadcast, then
    * bucket assignment as a narrow scan-speed compare. No per-language
    * total order anywhere, so a corpus-dominating language costs
    * nothing extra. Boundary docs can land one bucket off the exact
    * terciles (sketch error ε = 1/accuracy); spec pins ≥ 90 % agreement
    * with the exact form on the test corpus.
    */
  /** Frozen per-language tercile thresholds (lang, t1, t2) — the
    * artifact a batch calibration run hands to the streaming ingest
    * gate. Mergeable GK sketch agg: map-side partials, one row per
    * language out. */
  def ccnetThresholds(scoredLang: DataFrame,
      accuracy: Int = 10000): DataFrame =
    scoredLang.filter(col("avg_nll").isNotNull).groupBy("lang")
      .agg(percentile_approx(col("avg_nll"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("t"))
      .select(col("lang"), col("t")(0).as("t1"), col("t")(1).as("t2"))

  /** Bucket from (avg_nll, t1, t2) in scope — shared by the batch
    * approx path and the streaming gate so the assignment rule cannot
    * drift between them. Null score OR unknown language → null bucket
    * ("unknown", never "tail"). */
  private[graft] def bucketFromThresholds =
    when(col("avg_nll").isNull || col("t1").isNull,
      lit(null).cast("string"))
      .when(col("avg_nll") <= col("t1"), "head")
      .when(col("avg_nll") <= col("t2"), "middle")
      .otherwise("tail")

  def ccnetBucketsApprox(scoredLang: DataFrame,
      accuracy: Int = 10000): DataFrame = {
    val s = scoredLang.sparkSession
    import s.implicits._
    // ONE materialization of the sketch thresholds (r18 review):
    // percentile_approx is partial-merge-order-dependent, so a lazy
    // `th` evaluated once for the dump and again for the join could
    // dump thresholds that differ from the ones actually applied —
    // the nq_ccnet_buckets flake class. Lang-cardinality collect; the
    // dump and the broadcast join both read the collected rows.
    val thRows = ccnetThresholds(scoredLang, accuracy)
      .select(col("lang"), col("t1").cast("double"),
        col("t2").cast("double"))
      // Option: an all-null-score language has null thresholds, which
      // must stay null (bucket null), not NPE the encoder
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    val th = thRows.toDF("lang", "t1", "t2")
    // Verify-only: the sketch's thresholds, so the oracle re-runs the
    // bucket ASSIGNMENT (the SQL-expressible half) on the exact scored
    // corpus — the GK sketch itself stays engine-specific, pinned by
    // the ≥90%-agreement spec against the exact terciles
    graft.OracleDump.dump(th,
      s"$OracleDumpDir/ccnet_thresholds.parquet")
    scoredLang.join(broadcast(th), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("avg_nll"),
        bucketFromThresholds.as("bucket"))
  }

  /** Fixed absolute dir for this family's oracle-input dumps (see
    * [[graft.OracleDump]]). */
  private[graft] val OracleDumpDir = "/tmp/graft_text_oracle"

  private def scoredWithLang(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    docs.select(col("doc_id"), col("lang"))
      .join(lmScore(docs, bigramLm(docs.filter(col("doc_id") % 5 =!= 0)))
        .select("doc_id", "avg_nll"), Seq("doc_id"))
  }

  def q77CcnetBuckets(s: SparkSession, d: String): DataFrame =
    ccnetBuckets(scoredWithLang(s, d)).orderBy("doc_id")

  def nqCcnetBucketsApprox(s: SparkSession, d: String): DataFrame =
    ccnetBucketsApprox(scoredWithLang(s, d)).orderBy("doc_id")

  // ----------------------------------------------------------- contract

  def q65ShuffleShard(s: SparkSession, d: String): DataFrame =
    shuffleShard(documents(s, d), "doc_id", nShards = 8)
      .orderBy("doc_id")

  def q66BigramLm(s: SparkSession, d: String): DataFrame =
    bigramLm(documents(s, d))

  /** CCNet split: the LM trains on the reference four-fifths
    * (doc_id % 5 ≠ 0) and scores the WHOLE corpus, so the held-out
    * fifth genuinely exercises the unseen-bigram floor. */
  def q71LmScore(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    lmScore(docs, bigramLm(docs.filter(col("doc_id") % 5 =!= 0)))
      .orderBy("doc_id")
  }

  /** Shard-and-merge form: two LMs counted on the doc_id-parity halves
    * of the corpus, merged — must equal q66's whole-corpus table (and
    * carries q66's oracle so the driver re-proves it). */
  def q72BigramLmMerge(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    bigramLmMerge(Seq(
      bigramLm(docs.filter(col("doc_id") % 2 === 0)),
      bigramLm(docs.filter(col("doc_id") % 2 =!= 0))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_shuffle_shard" -> (q65ShuffleShard _),
    "q66_bigram_lm" -> (q66BigramLm _),
    "q71_lm_score" -> (q71LmScore _),
    "q72_bigram_lm_merge" -> (q72BigramLmMerge _),
    "q77_ccnet_buckets" -> (q77CcnetBuckets _),
    "nq_ccnet_buckets" -> (nqCcnetBucketsApprox _))

  val q66Sql: String =
    """WITH toks AS (
      |  SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
      |    AS l
      |  FROM documents
      |), bg AS (
      |  SELECT l[i] AS w1, l[i + 1] AS w2
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
      |), cnt AS (
      |  SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2
      |)
      |SELECT w1, w2, n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY w1), 4) AS p
      |FROM cnt ORDER BY w1, w2""".stripMargin

  // q65 oracle: Mixing's XXH64 replica supplies the unsigned hash `hh`;
  // the signed key is hh − 2^64 for values ≥ 2^63 (two's complement),
  // and because 8 divides 2^64 the unsigned residue hh % 8 IS Spark's
  // signed pmod(hkey, 8) — the contract entry fixes nShards to a power
  // of two precisely so the oracle needs no signed-mod correction.
  // q66 oracle: same tokenizer as q25/q63 (list_filter strips empties),
  // adjacent pairs via generate_series, identical integer counts, and
  // P(w2|w1) divides the same BIGINTs into a DOUBLE in both engines.
  val oracle: Map[String, String] = Map(
    "q65_shuffle_shard" -> (Mixing.xxh64Ctes("") +
      """,
        |sgn AS (SELECT doc_id,
        |  CAST(CAST(hh AS HUGEINT) -
        |    CASE WHEN hh >= 9223372036854775808
        |      THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END
        |    AS BIGINT) AS hkey,
        |  CAST(hh % 8 AS BIGINT) AS shard FROM r2h)
        |SELECT doc_id, shard,
        |  row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id)
        |    AS pos
        |FROM sgn ORDER BY doc_id""".stripMargin),
    // q71 oracle: q66's LM pipeline restricted to the reference split,
    // the same adjacent-pair construction for the scored corpus, and
    // the identical greatest(coalesce(p, floor), floor) clamp before
    // ln — both engines average the same doubles and round to 4 digits.
    "q71_lm_score" -> (q71Core + "\nORDER BY doc_id"),
    // q77: q71's scored corpus (nested WITH in the first CTE), ranked
    // within language by (avg_nll, doc_id); the tercile is the explicit
    // integer formula (3·(r−1)) // n — identical div semantics both
    // engines, no ntile remainder convention to trust. Unscored docs
    // surface with null bucket.
    "q77_ccnet_buckets" ->
      s"""WITH scored AS (
         |$q71Core
         |), langd AS (
         |  SELECT doc_id, lang FROM documents
         |), j AS (
         |  SELECT s.doc_id, l.lang, s.avg_nll
         |  FROM scored s JOIN langd l USING (doc_id)
         |), rk AS (
         |  SELECT doc_id, lang, avg_nll,
         |    row_number() OVER (PARTITION BY lang
         |                       ORDER BY avg_nll, doc_id) AS r,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM j WHERE avg_nll IS NOT NULL
         |), b AS (
         |  SELECT doc_id,
         |    CASE (3 * (r - 1)) // n WHEN 0 THEN 'head'
         |      WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
         |  FROM rk
         |)
         |SELECT j.doc_id, j.lang, j.avg_nll, b.bucket
         |FROM j LEFT JOIN b USING (doc_id)
         |ORDER BY j.doc_id""".stripMargin,
    "q66_bigram_lm" -> q66Sql,
    // the shard-and-merge form must reproduce the whole-corpus table
    // bit-for-bit, so it carries the SAME oracle — the driver re-proves
    // merge ≡ monolithic every round
    "q72_bigram_lm_merge" -> q66Sql,
    // nq_ccnet_buckets (round-10 promotion): the scored corpus comes
    // from q71's SQL, the tercile THRESHOLDS from the dumped GK-sketch
    // output (engine-specific, spec-pinned for accuracy), and the
    // assignment rule — null score or unknown language → null bucket,
    // else <= t1 / <= t2 / tail — re-runs in DuckDB; both engines
    // compare the same round-4 doubles against the same dumped values
    "nq_ccnet_buckets" ->
      s"""WITH scored AS (
         |$q71Core
         |), langd AS (
         |  SELECT doc_id, lang FROM documents
         |), j AS (
         |  SELECT s.doc_id, l.lang, s.avg_nll
         |  FROM scored s JOIN langd l USING (doc_id)
         |), th AS (
         |  SELECT lang, t1, t2
         |  FROM read_parquet('$OracleDumpDir/ccnet_thresholds.parquet/*.parquet')
         |)
         |SELECT j.doc_id, j.lang, j.avg_nll,
         |  CASE WHEN j.avg_nll IS NULL OR th.t1 IS NULL THEN NULL
         |       WHEN j.avg_nll <= th.t1 THEN 'head'
         |       WHEN j.avg_nll <= th.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM j LEFT JOIN th USING (lang)
         |ORDER BY j.doc_id""".stripMargin)

  /** q71's scored-corpus query WITHOUT the presentation sort — shared
    * by the q71 oracle (which appends it) and q77's first CTE (which
    * must not carry an inner ORDER BY). */
  private lazy val q71Core: String =
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
        |      AS l
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
        |), cnt AS (
        |  SELECT w1, w2, count(*) AS n FROM bg
        |  WHERE doc_id % 5 <> 0 GROUP BY 1, 2
        |), lm AS (
        |  SELECT w1, w2,
        |    round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY w1), 4) AS p
        |  FROM cnt
        |), sc AS (
        |  SELECT bg.doc_id, count(*) AS n_bigrams,
        |    round(avg(-ln(greatest(coalesce(lm.p, 0.0001), 0.0001))), 4)
        |      AS avg_nll
        |  FROM bg LEFT JOIN lm USING (w1, w2)
        |  GROUP BY bg.doc_id
        |)
        |SELECT d.doc_id, sc.n_bigrams, sc.avg_nll
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN sc USING (doc_id)""".stripMargin
}
