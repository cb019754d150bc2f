package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Product-quantization ANN — the memory-compression scale path next to
  * IVF and sign-LSH: 64-float embeddings become m=8 one-byte codes
  * (32× smaller), so the whole index stays in memory at corpus sizes
  * where raw vectors cannot.
  *
  *  1. TRAIN: split dims into m subspaces; per subspace, k=32-centroid
  *     Lloyd's k-means on a seeded bounded SAMPLE collected to the
  *     driver (codebook training on a sample is the standard practice —
  *     the codebook is a few KB regardless of corpus size).
  *  2. ENCODE: one narrow typed pass maps every vector to its m nearest
  *     sub-centroids (the PQ code) — embarrassingly parallel, no shuffle.
  *  3. SEARCH (ADC): per query, an m×k lookup table of partial dot
  *     products/centroid norms is built driver-side and shipped in the
  *     closure; scoring a corpus vector is m table lookups, done in
  *     mapPartitions with per-partition top-`shortlist` heaps so only
  *     ~shortlist candidates per partition ever shuffle.
  *  4. RE-RANK: the shortlist joins back to the raw vectors for exact
  *     cosine (codegen'd vec_dot); final top-k is exact-on-candidates.
  *
  * Seeded throughout → deterministic. Recall vs exact q30 is asserted
  * in the test suite.
  */
object PqKnn {

  /** Lloyd's k-means on driver-side sample (rows × dim), fixed iters.
    * Shared with IvfPq's residual-codebook training.
    */
  private[sim] def lloyd(rows: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val dim = rows.head.length
    val rnd = new scala.util.Random(seed)
    val cents = Array.tabulate(k)(i =>
      rows(rnd.nextInt(rows.length)).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      rows.foreach { r =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) {
            val diff = r(j) - cents(c)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += r(j); j += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) {
            cents(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  def pqKnn(s: SparkSession, d: String, m: Int = 8, k: Int = 32,
      topK: Int = 5, shortlist: Int = 100, nQueries: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VecFunctions.register(s)
    import s.implicits._
    // materialized once: FOUR actions read this lineage (codebook
    // sample, query collect, the ADC encode/scan, the re-rank's
    // raw-vector join) — same shape and same fix as IvfPq's `assigned`
    // (checkpoint, not cache: blocks are released by the ContextCleaner
    // when the caller drops the result; see Checkpointing for the
    // local-vs-reliable durability modes)
    val emb = graft.Checkpointing.truncate(
      embeddings(s, d).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])])
    // 1. TRAIN on a content-deterministic bounded sample (≤ ~2k rows
    // regardless of SF): order by a hash of the id and take the first
    // 2000 — independent of partition layout (unlike Bernoulli sample()
    // + LocalLimit, whose rows depend on split sizes / parallelism, so
    // codebooks would change with SPARK_GRAFT_CPUS) AND spread uniformly
    // over the id space (an id-prefix sample would bias the codebooks
    // toward whatever was ingested first)
    val sample = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(2000)
      .as[(Long, Array[Float])]
      .collect().map(_._2)
    require(sample.nonEmpty, "pqKnn: embeddings table is empty")
    val dim = sample.head.length
    require(dim % m == 0, "dim must divide into m subspaces")
    val sub = dim / m
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { mi =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, mi * sub,
        (mi + 1) * sub)), k, iters = 10, seed = 42L + mi)
    }
    // 2. ENCODE: narrow typed pass, codebooks ship in the closure (KBs)
    val codes = emb.map { case (id, v) =>
      val code = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        val cb = codebooks(mi); val off = mi * sub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0; var j = 0
          while (j < sub) {
            val diff = v(off + j) - cb(c)(j); dd += diff * diff; j += 1
          }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        code(mi) = best; mi += 1
      }
      (id, code)
    }.toDF("vec_id", "code").as[(Long, Array[Int])]
    // codeword sub-norms — query-INDEPENDENT, built once (m×k doubles)
    val cn2: Array[Array[Double]] = Array.tabulate(m, k) { (mi, c) =>
      var acc = 0.0; var j = 0
      while (j < sub) {
        acc += codebooks(mi)(c)(j).toDouble * codebooks(mi)(c)(j); j += 1
      }
      acc
    }
    // 3. ADC lookup tables for the query set (driver-side, tiny);
    // column filter, not a typed lambda — prunable/pushable against
    // the checkpointed relation
    val queryVecs = emb.filter(col("vec_id") < nQueries)
      .collect().sortBy(_._1)
    val luts: Array[(Long, Array[Array[Double]], Double)] =
      queryVecs.map { case (qid, q) =>
        val dots = Array.tabulate(m, k) { (mi, c) =>
          var acc = 0.0; var j = 0
          while (j < sub) { acc += q(mi * sub + j) * codebooks(mi)(c)(j); j += 1 }
          acc
        }
        val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
        (qid, dots, qn)
      }
    // per-partition top-`shortlist` heaps per query: only ~shortlist
    // candidates per (partition, query) ever leave the scoring pass
    // heap eviction order matches the downstream (est_cos desc, cand_id)
    // window exactly — lexicographic (-score, id) makes score TIES evict
    // the larger id deterministically, so the shortlist cannot depend on
    // partition arrival order
    val cands = codes.mapPartitions { it =>
      val heaps = luts.map(q =>
        (q._1, new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by(x => (-x._1, x._2)))))
      it.foreach { case (id, code) =>
        var qi = 0
        while (qi < luts.length) {
          val (qid, dots, qn) = luts(qi)
          if (id != qid) {
            var est = 0.0; var n2 = 0.0
            var mi = 0
            while (mi < m) {
              est += dots(mi)(code(mi)); n2 += cn2(mi)(code(mi)); mi += 1
            }
            val cos = est / (qn * math.max(math.sqrt(n2), 1e-12))
            val h = heaps(qi)._2
            h.enqueue((cos, id))
            if (h.size > shortlist) h.dequeue()
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, h) =>
        h.iterator.map { case (cos, id) => (qid, id, cos) }
      }
    }.toDF("query_id", "cand_id", "est_cos")
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("est_cos").desc, col("cand_id"))
    val short = cands.withColumn("rs", row_number().over(wShort))
      .filter(col("rs") <= shortlist)
      .select("query_id", "cand_id")
    // Verify-only: the ADC shortlist, so the oracle re-runs the exact
    // re-rank tail on it (see VecPrep.AnnOracleDir)
    graft.OracleDump.dump(short,
      s"${VecPrep.AnnOracleDir}/nq_pq_knn.parquet")
    // 4. exact re-rank of the shortlist only — norms recomputed from
    // the CHECKPOINTED relation, not a fresh table scan
    val raw = emb.toDF()
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
    val qdf = raw.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    VecPrep.exactRerank(short, raw, qdf, topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_pq_knn" -> ((s: SparkSession, d: String) => pqKnn(s, d)))

  /** Exact-re-rank oracle over the dumped ADC shortlist. */
  val oracle: Map[String, String] = Map(
    "nq_pq_knn" -> VecPrep.rerankOracleSql("nq_pq_knn"))
}
