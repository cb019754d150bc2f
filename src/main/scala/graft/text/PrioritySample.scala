package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Weighted sampling without replacement — priority sampling
  * (Duffield, Lund, Thorup, JACM 2007: "Priority sampling for
  * estimation of arbitrary subset sums"; the same u/w key ordering as
  * Ohlsson's sequential Poisson sampling).
  *
  * The training-data use: draw k documents per domain with inclusion
  * probability increasing in a weight column (here: document size),
  * and keep the sample USEFUL FOR ESTIMATION — each sampled row
  * carries an adjusted weight ŵ such that Σ_{i∈S∩A} ŵ_i is an
  * unbiased estimator of Σ_{i∈A} w_i for ANY subset A of the group
  * (the DLT theorem). That turns a 20-doc sample into an honest
  * estimate of e.g. total corpus bytes per source without a second
  * scan — the capability plain hash-threshold mixing lacks.
  *
  * Mechanics, all exact IEEE arithmetic (no transcendentals — this is
  * why priority sampling is chosen over the Efraimidis–Spirakis
  * u^(1/w) key, whose pow/log would be library-dependent):
  *   u_i  = (floor(xxh64(id, seed) / 2^11) + 1) · 2^-53   ∈ (0, 1]
  *   q_i  = w_i / u_i                                (the priority)
  *   S    = the k largest priorities per group
  *   τ    = the (k+1)-th largest priority (0 if the group fits in k)
  *   ŵ_i  = max(w_i, τ) for i ∈ S
  * Selection is a pure function of (id, seed): the same sample at any
  * parallelism or layout, reproducible across runs — the hash-
  * threshold discipline of `Mixing.domainMix` extended to exact-k
  * weighted draws.
  *
  * Scale shape: ONE corpus scan feeding the k+1-bounded `top_k`
  * TypedImperativeAggregate (functions.BoundedTopK) — per-partition
  * heaps mean the exchange carries ≤ (k+1) rows per (group, map
  * partition) however large the corpus is, where the window
  * row_number form would shuffle every row to its group's reducer.
  * The τ extraction and ŵ are per-group array surgery on ≤ k+1
  * elements. No window, no second scan.
  */
object PrioritySample {

  /** Per-group priority sample of `docs` (k largest priorities, with
    * the DLT adjusted-weight column). Output: one row per sampled doc,
    * (group, rank, doc_id, n_chars, priority, est_weight), rank 1-based
    * by descending priority.
    *
    * The weight is `weightCol` cast to double (must be ≥ 0; zero-weight
    * rows get priority 0 and are only drawn from groups that fit
    * entirely). Ties in priority (measure-zero for distinct ids) break
    * to the larger doc_id, deterministically.
    */
  def prioritySample(docs: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"prioritySample: k must be >= 1, got $k")
    val spark = docs.sparkSession
    graft.functions.VecFunctions.register(spark)
    val kk = k + 1
    // null ids/weights cannot be sampled (no hash, no priority) and
    // would otherwise reach the heap as structs with null fields —
    // dropped up front, like the SQL aggregates drop null inputs
    val clean = docs.filter(col(idCol).isNotNull && col(weightCol).isNotNull)
    // u ∈ (0, 1]: top 53 bits of the hash, +1 so u is never 0 (and a
    // 53-bit integer + 1 is still exact as a double); division by 2^53
    // is a power-of-two scale — every step identical in any IEEE engine
    val u = (shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
      .cast("double") + lit(1.0)) / lit(9007199254740992.0)
    val withPriority = clean.select(col(groupCol), col(idCol),
        col(weightCol), (col(weightCol).cast("double") / u).as("priority"))
      .select(col(groupCol),
        struct(col("priority"), col(idCol), col(weightCol)).as("sv"))
    val topped = withPriority.groupBy(groupCol)
      .agg(expr(s"top_k(sv, $kk)").as("top"))
      // τ: the (k+1)-th priority if the group overflowed k, else 0 —
      // per-group scalar read straight off the ≤ k+1-element array
      .select(col(groupCol),
        when(size(col("top")) === kk,
          element_at(col("top"), kk).getField("priority"))
          .otherwise(lit(0.0)).as("tau"),
        col("top"))
    topped.select(col(groupCol), col("tau"),
        posexplode(col("top")).as(Seq("pos", "t")))
      .filter(col("pos") < k)
      .select(col(groupCol), (col("pos") + lit(1)).cast("long").as("rank"),
        col(s"t.$idCol").as(idCol), col(s"t.$weightCol").as(weightCol),
        col("t.priority").as("priority"),
        greatest(col(s"t.$weightCol").cast("double"), col("tau"))
          .as("est_weight"))
      .orderBy(col(groupCol), col("rank"))
  }

  /** Contract query: k=20 per-language priority sample of the
    * documents corpus weighted by document size. */
  def q88PrioritySample(s: SparkSession, d: String): DataFrame =
    prioritySample(t(s, d, "documents"), "lang", "doc_id", "n_chars", 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_priority_sample" -> (q88PrioritySample _))

  // Oracle: the validated XXH64-long replica (Mixing.xxh64CtesOver)
  // feeds the identical u / priority / τ / ŵ double chain — every float
  // op is a power-of-two scale, one division, or max, so the compare is
  // bit-exact. Selection is re-derived the naive way (full window
  // row_number), re-proving the bounded-heap path semantics-preserving
  // every round.
  val oracle: Map[String, String] = Map(
    "q88_priority_sample" -> (Mixing.xxh64CtesOver(
      "documents", "doc_id", ", lang, n_chars") +
      """,
        |pr AS (SELECT lang, doc_id, n_chars,
        |         CAST(n_chars AS DOUBLE) /
        |           ((CAST(hh // 2048 AS DOUBLE) + 1.0)
        |             / 9007199254740992.0) AS priority
        |       FROM r2h),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY lang
        |         ORDER BY priority DESC, doc_id DESC) AS rank FROM pr),
        |tau AS (SELECT lang,
        |         coalesce(max(CASE WHEN rank = 21 THEN priority END), 0.0)
        |           AS tau
        |        FROM rk GROUP BY lang)
        |SELECT r.lang, r.rank, r.doc_id, r.n_chars, r.priority,
        |       greatest(CAST(r.n_chars AS DOUBLE), t.tau) AS est_weight
        |FROM rk r JOIN tau t ON r.lang = t.lang
        |WHERE r.rank <= 20
        |ORDER BY r.lang, r.rank""".stripMargin))
}
