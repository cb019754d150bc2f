package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance selection (Carbonell & Goldstein,
  * SIGIR 1998): greedily pick k items maximizing
  *   λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
  * — the diversity-aware subset selection a training-data pipeline
  * runs AFTER retrieval: top-k-by-relevance alone returns k near-
  * copies of the best match (this corpus's near-dup structure is the
  * whole reason the dedup family exists); MMR trades relevance
  * against redundancy with the already-selected set.
  *
  * Scale shape — the operator is deliberately two-tier, like every
  * sequential-core algorithm in the repo (BPE merge learning,
  * driver-side Lloyd, ≤1M-edge union-find):
  *   1. DISTRIBUTED: relevance scoring + candidate shortlist (any
  *      retrieval tier — exact kNN here, IVF/NSW at scale) bounds the
  *      working set to C = k·oversample rows, and the C² candidate-
  *      pair similarity matrix is one broadcast self-join over those
  *      C rows. 100 TB of corpus never meets the greedy loop.
  *   2. DRIVER: the greedy argmax chain itself is inherently
  *      sequential (each step's scores depend on the previous pick);
  *      it runs over the COLLECTED C-row shortlist (bounded by
  *      construction — the BoundedTopK/bounded-collect discipline),
  *      O(k·C) score updates on a C×C map.
  *
  * Cross-engine determinism: the oracle replays the greedy over the
  * DUMPED relevance/similarity doubles (never recomputing cosines),
  * so each step's argmax compares bit-identical values on both
  * engines; ties break to the smaller id on both. λ and 1−λ are both
  * spelled as literals (0.7 / 0.3) in Scala and SQL — `1 − 0.7`
  * evaluates to 0.30000000000000004 and would fork the trees.
  */
object Mmr {

  /** Greedy MMR over a BOUNDED candidate relation
    * (id, rel, embedding, nrm). Returns (rank, id, rel, mmr_score) —
    * rank is 1-based pick order. `cands` must be small enough to
    * collect (the shortlist contract above); enforced with a hard cap
    * to fail loudly rather than OOM the driver.
    */
  def mmrSelect(cands: DataFrame, k: Int, lambda: Double,
      oneMinusLambda: Double, maxCandidates: Int = 10000): DataFrame = {
    val s = cands.sparkSession
    graft.functions.VecFunctions.register(s)
    // distributed half: the C² pair-similarity matrix (broadcast self
    // join over the bounded shortlist)
    val a = cands.select(col("id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = cands.select(col("id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val sims = a.join(broadcast(b), col("a") =!= col("b"))
      .select(col("a"), col("b"),
        (expr("vec_dot(ea, eb)") / (col("na") * col("nb"))).as("sim"))
    val relRows = cands.select(col("id"), col("rel"))
      .limit(maxCandidates + 1).collect()
    require(relRows.length <= maxCandidates,
      s"mmrSelect: candidate set exceeds the $maxCandidates driver " +
        "cap — shortlist with a retrieval tier first")
    val rel = relRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val simMap = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // sequential half: k greedy steps, ties to the smaller id
    val picked = scala.collection.mutable.ArrayBuffer.empty[
      (Int, Long, Double, Double)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++
      rel.keys
    for (step <- 1 to math.min(k, rel.size)) {
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      // ascending-id iteration + strict > makes the tie-break
      // (smaller id wins) explicit
      remaining.foreach { id =>
        // max over the selected set only — NOT floored at 0 (the SQL
        // replica is COALESCE(max(sim), 0): 0 stands in for the EMPTY
        // set, but an all-negative sim set keeps its negative max)
        val maxSim = if (picked.isEmpty) 0.0
          else picked.iterator.map(p => simMap((id, p._2))).max
        val score = lambda * rel(id) - oneMinusLambda * maxSim
        if (score > bestScore) { bestScore = score; bestId = id }
      }
      picked += ((step, bestId, rel(bestId), bestScore))
      remaining -= bestId
    }
    import s.implicits._
    picked.toSeq.toDF("rank", "id", "rel", "mmr_score")
  }

  // ------------------------------------------------------------ nq_mmr
  private val Dir = "/tmp/graft_mmr_oracle"
  private val K = 10
  private val C = 40

  /** Contract entry: top-40-by-cosine shortlist against query vector 0
    * (q30's exact retrieval tier), then 10 MMR picks at λ = 0.7. Dumps
    * the shortlist relevances and the pair-sim matrix; the oracle
    * replays the unrolled greedy over those doubles. */
  def nqMmrSelect(s: SparkSession, d: String): DataFrame = {
    val e = VecPrep.normed(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("id"), col("embedding"), col("nrm"),
        (expr("vec_dot(embedding, qe)") / (col("nrm") * col("qn")))
          .as("rel"))
    val shortlist = scored
      .orderBy(col("rel").desc, col("id")).limit(C)
    if (graft.OracleDump.enabled) {
      graft.OracleDump.dump(shortlist.select("id", "rel"),
        s"$Dir/mmr_rel.parquet")
      val a = shortlist.select(col("id").as("a"), col("embedding").as("ea"),
        col("nrm").as("na"))
      val b = shortlist.select(col("id").as("b"), col("embedding").as("eb"),
        col("nrm").as("nb"))
      graft.OracleDump.dump(
        a.join(broadcast(b), col("a") =!= col("b"))
          .select(col("a"), col("b"),
            (expr("vec_dot(ea, eb)") / (col("na") * col("nb"))).as("sim")),
        s"$Dir/mmr_sims.parquet")
    }
    mmrSelect(shortlist, K, lambda = 0.7, oneMinusLambda = 0.3)
      .select(col("rank"), col("id"), round(col("rel"), 6).as("rel"),
        round(col("mmr_score"), 6).as("mmr_score"))
      .orderBy("rank")
  }

  /** Unrolled 10-step greedy (the q101/q102 unrolled-iteration
    * pattern): step i picks the argmax of λ·rel − (1−λ)·max-sim-to-
    * selected over the dumped doubles, ORDER BY score DESC, id LIMIT 1
    * — the exact tie-break the Scala loop implements. MATERIALIZED
    * per step (DuckDB inlines CTEs; the selection union is referenced
    * twice per later step). mmr_score is signed → `+ 0.0` (the
    * nq_mfcc_delta -0.0 lesson). */
  private def nqMmrSql: String = {
    val steps = (1 to K).map { i =>
      if (i == 1)
        s"""s1 AS MATERIALIZED (
           |  SELECT 1 AS rank, id, rel, 0.7 * rel - 0.3 * 0.0 AS score
           |  FROM cand ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, id LIMIT 1)"""
          .stripMargin
      else {
        val prev = (1 until i).map(j => s"SELECT id FROM s$j")
          .mkString(" UNION ALL ")
        s"""u${i - 1} AS MATERIALIZED ($prev),
           |s$i AS MATERIALIZED (
           |  SELECT $i AS rank, d.id, d.rel,
           |    0.7 * d.rel - 0.3 * COALESCE(
           |      (SELECT max(s.sim) FROM sims s
           |       WHERE s.a = d.id AND s.b IN (SELECT id FROM u${i - 1})),
           |      0.0) AS score
           |  FROM cand d WHERE d.id NOT IN (SELECT id FROM u${i - 1})
           |  ORDER BY score DESC, d.id LIMIT 1)""".stripMargin
      }
    }.mkString(",\n")
    val all = (1 to K).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH cand AS (
       |  SELECT * FROM read_parquet('$Dir/mmr_rel.parquet/*.parquet')),
       |sims AS (
       |  SELECT * FROM read_parquet('$Dir/mmr_sims.parquet/*.parquet')),
       |$steps
       |SELECT rank, id, round(rel, 6) + 0.0 AS rel,
       |  round(score, 6) + 0.0 AS mmr_score
       |FROM ($all)
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_mmr_select" -> (nqMmrSelect _))

  val oracle: Map[String, String] = Map(
    "nq_mmr_select" -> nqMmrSql)
}
