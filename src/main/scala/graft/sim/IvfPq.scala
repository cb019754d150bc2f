package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the composite the two standalone indexes exist for, and the
  * workhorse layout of billion-vector ANN systems: an IVF coarse
  * quantizer prunes the search to nProbe cells, and within cells
  * vectors are PQ codes over RESIDUALS (v − centroid), so the quantizer
  * only has to express the small within-cell displacement instead of
  * the whole vector — tighter codes from the same bit budget.
  *
  *  1. COARSE: seeded Lloyd's k-means (shared `PqKnn.lloyd`) on a
  *     content-deterministic bounded SAMPLE collected to the driver —
  *     the standard IVF practice (FAISS trains its coarse quantizer on
  *     a bounded sample regardless of corpus size; Johnson et al. 2017,
  *     "Billion-scale similarity search with GPUs"): the quantizer is
  *     kCells×dim KBs, so training it distributed buys nothing and
  *     costs a multi-job iterative fit over the whole corpus per build.
  *  2. RESIDUAL PQ: codebooks trained (same `PqKnn.lloyd`) on the SAME
  *     collected sample's residuals; one narrow typed pass then
  *     assigns + encodes every vector to (cell, m-byte code) — the
  *     ONLY corpus-wide work in the build, shuffle-free.
  *  3. SEARCH: each query routes to its nProbe nearest cells; ADC
  *     scoring touches ONLY vectors in probed cells, via lookup tables
  *     built once per query from the residual decomposition
  *       dot(q, v̂)   = dot(q, c) + Σᵢ dot(qᵢ, r̂ᵢ)
  *       ‖v̂‖²        = Σᵢ (‖cᵢ‖² + 2·cᵢ·r̂ᵢ + ‖r̂ᵢ‖²)
  *     (q-dependent tables are m×k per query; cell-dependent tables are
  *     kCells×m×k doubles total — all closure-shipped KBs). Scoring is
  *     mapPartitions with per-(partition, query) bounded heaps, so only
  *     ~shortlist candidates per partition ever shuffle.
  *  4. RE-RANK: exact cosine (codegen'd vec_dot) on the shortlist only.
  *
  * At 100 TB the cells are the unit of data skipping (cluster-by column
  * at rest → a probe reads nProbe/kCells of the index) and the PQ codes
  * are the unit of memory (32× under raw floats). Seeded throughout →
  * deterministic; recall vs exact q30 pinned in IvfPqSpec.
  */
object IvfPq {

  def ivfPqKnn(s: SparkSession, d: String, kCells: Int = 16,
      nProbe: Int = 4, m: Int = 8, k: Int = 32, topK: Int = 5,
      shortlist: Int = 100, nQueries: Int = 10): DataFrame = {
    import s.implicits._
    val (_, cents, codebooks, codes) = trainEncode(s, d, kCells, m, k)
    // query vectors straight off the source scan (pushed-down id
    // filter) — the search never needs the cell-assigned relation
    val queryVecs = graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < nQueries)
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    // exact re-rank reads the source table, same as the store path —
    // the index never carries the raw floats
    val raw = graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    searchCodes(codes, raw, queryVecs, cents, codebooks,
      nProbe, topK, shortlist, oracleDumpName = Some("nq_ivfpq_knn"))
  }

  /** Nearest coarse centroid by squared L2 — the assignment primitive
    * shared by the corpus build and [[IvfPqStore.encodeBatch]]. */
  private[sim] def nearestCell(v: Array[Float],
      cents: Array[Array[Float]]): Int = {
    val dim = cents.head.length
    var best = 0; var bestD = Double.MaxValue
    var cell = 0
    while (cell < cents.length) {
      var dd = 0.0; var j = 0
      while (j < dim) {
        val diff = v(j) - cents(cell)(j); dd += diff * diff; j += 1
      }
      if (dd < bestD) { bestD = dd; best = cell }
      cell += 1
    }
    best
  }

  /** Train the coarse quantizer + residual codebooks and encode the
    * whole corpus — shared by the in-query composite and
    * [[IvfPqStore.buildIndex]] (which persists the result). All seeds
    * fixed, so the two paths produce IDENTICAL indexes.
    *
    * Both model halves train driver-side on ONE content-deterministic
    * bounded sample (≤ 2000 rows regardless of SF — hash-of-id order,
    * so the sample is layout-independent and spread over the id space):
    * the models are KBs, so the only corpus-wide work is the single
    * shuffle-free assign+encode pass, and the whole build costs one
    * small collect + one scan instead of an iterative distributed fit.
    * (An earlier revision trained the coarse quantizer with an MLlib
    * KMeans fit over the full corpus and checkpointed the assigned
    * relation for its multiple consumers — ~25 Spark jobs and a
    * corpus-sized materialization per build, which made the in-query
    * composite the slowest headline query at sf0.1 and would be a
    * full-corpus iterative rewrite per build at 100 TB.) */
  private[sim] def trainEncode(s: SparkSession, d: String, kCells: Int,
      m: Int, k: Int)
      : (Dataset[(Long, Array[Float], Int)], Array[Array[Float]],
        Array[Array[Array[Float]]], Dataset[(Long, Int, Array[Int])]) = {
    import s.implicits._
    val emb = graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val sample = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(2000)
      .collect().map(_._2)
    require(sample.nonEmpty, "ivfPqKnn: embeddings table is empty")
    val dim = sample.head.length
    require(dim % m == 0, "dim must divide into m subspaces")
    val sub = dim / m
    val cents = PqKnn.lloyd(sample, kCells, iters = 10, seed = 42L)

    // residual codebooks from the SAME sample (no second collect)
    val sampleRes = sample.map { v =>
      val c = cents(nearestCell(v, cents))
      Array.tabulate(dim)(j => v(j) - c(j))
    }
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { mi =>
      PqKnn.lloyd(sampleRes.map(r => java.util.Arrays.copyOfRange(
        r, mi * sub, (mi + 1) * sub)), k, iters = 10, seed = 142L + mi)
    }
    // assign + encode in ONE narrow pass — the plan is its own single
    // consumer, so no checkpoint/materialization is needed
    val assigned = emb.map { case (id, v) => (id, v, nearestCell(v, cents)) }
      .toDF("vec_id", "embedding", "cell")
      .as[(Long, Array[Float], Int)]
    (assigned, cents, codebooks, encodeAssigned(assigned, cents, codebooks))
  }

  /** PQ-encode already-cell-assigned vectors: (vec_id, cell, code) —
    * residual vs own centroid, nearest codeword per subspace. Shared by
    * the corpus build and the store's incremental [[IvfPqStore
    * .encodeBatch]] (new vectors encoded under a FROZEN index). */
  private[sim] def encodeAssigned(
      vecs: Dataset[(Long, Array[Float], Int)],
      cents: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]])
      : Dataset[(Long, Int, Array[Int])] = {
    val s = vecs.sparkSession
    import s.implicits._
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    vecs.map { case (id, v, cell) =>
      val code = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        val cb = codebooks(mi); val off = mi * sub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0; var j = 0
          while (j < sub) {
            val diff = (v(off + j) - cents(cell)(off + j)) - cb(c)(j)
            dd += diff * diff; j += 1
          }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        code(mi) = best; mi += 1
      }
      (id, cell, code)
    }.toDF("vec_id", "cell", "code").as[(Long, Int, Array[Int])]
  }

  /** ADC search + exact re-rank over an encoded relation — shared by
    * the in-query composite above and the persisted-index path
    * ([[IvfPqStore.searchIndex]]). `rawForRerank` supplies the original
    * float vectors for the shortlist re-rank (the index itself never
    * stores them — real deployments re-rank from the source table).
    */
  private[sim] def searchCodes(codes: Dataset[(Long, Int, Array[Int])],
      rawForRerank: DataFrame, queryVecs: Array[(Long, Array[Float])],
      cents: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      nProbe: Int, topK: Int, shortlist: Int,
      oracleDumpName: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = codes.sparkSession
    import s.implicits._
    graft.functions.VecFunctions.register(s)
    val m = codebooks.length
    val k = codebooks.head.length
    val sub = codebooks.head.head.length
    val dim = cents.head.length
    require(dim == m * sub,
      s"centroid dim $dim inconsistent with $m×$sub codebooks")

    // query-independent tables: centroid sub-norms, centroid·codeword,
    // codeword norms (kCells×m×k + m×k doubles — KBs)
    val cn2: Array[Double] = cents.map(c => c.map(x => x.toDouble * x).sum)
    val cr: Array[Array[Array[Double]]] = Array.tabulate(cents.length) { cell =>
      Array.tabulate(m, k) { (mi, c) =>
        var acc = 0.0; var j = 0
        while (j < sub) {
          acc += cents(cell)(mi * sub + j).toDouble * codebooks(mi)(c)(j)
          j += 1
        }
        acc
      }
    }
    val rr: Array[Array[Double]] = Array.tabulate(m, k) { (mi, c) =>
      var acc = 0.0; var j = 0
      while (j < sub) {
        acc += codebooks(mi)(c)(j).toDouble * codebooks(mi)(c)(j); j += 1
      }
      acc
    }

    val luts = queryVecs.map { case (qid, q) =>
      val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
      // nProbe nearest cells by cosine (deterministic cell tie-break)
      val probed = cents.indices
        .map { cell =>
          var dot = 0.0; var j = 0
          while (j < dim) { dot += q(j) * cents(cell)(j); j += 1 }
          (-dot / math.max(math.sqrt(cn2(cell)), 1e-12), cell)
        }
        .sorted.take(nProbe).map(_._2).toSet
      val qc: Array[Double] = cents.map { c =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += q(j) * c(j); j += 1 }
        acc
      }
      val qr: Array[Array[Double]] = Array.tabulate(m, k) { (mi, c) =>
        var acc = 0.0; var j = 0
        while (j < sub) { acc += q(mi * sub + j) * codebooks(mi)(c)(j); j += 1 }
        acc
      }
      (qid, probed, qc, qr, qn)
    }

    // restrict the scan to the UNION of every query's probed cells
    // BEFORE the ADC pass: semantically a no-op (each query still
    // checks its own probed set), but against a cell-partitioned store
    // (IvfPqStore writes codes partitionBy("cell")) this predicate
    // prunes whole directories — the "cells are the unit of data
    // skipping" property made real rather than aspirational
    val allProbed = luts.flatMap(_._2).distinct.toSeq
    val scanned = codes.filter(col("cell").isin(allProbed: _*))

    // ADC over probed cells only, bounded per-partition heaps
    val cands = scanned.mapPartitions { it =>
      val heaps = luts.map(q =>
        (q._1, new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
          Ordering.by(x => (-x._1, x._2)))))
      it.foreach { case (id, cell, code) =>
        var qi = 0
        while (qi < luts.length) {
          val (qid, probed, qc, qr, qn) = luts(qi)
          if (id != qid && probed.contains(cell)) {
            var dotQR = 0.0; var n2 = cn2(cell)
            var mi = 0
            while (mi < m) {
              val c = code(mi)
              dotQR += qr(mi)(c)
              n2 += 2.0 * cr(cell)(mi)(c) + rr(mi)(c)
              mi += 1
            }
            val cos = (qc(cell) + dotQR) /
              (qn * math.max(math.sqrt(math.max(n2, 0.0)), 1e-12))
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
    oracleDumpName.foreach(n => graft.OracleDump.dump(short,
      s"${VecPrep.AnnOracleDir}/$n.parquet"))

    val raw = rawForRerank
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
    val qids = queryVecs.map(_._1)
    val qdf = raw.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    VecPrep.exactRerank(short, raw, qdf, topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_ivfpq_knn" -> ((s: SparkSession, d: String) => ivfPqKnn(s, d)))

  /** Exact-re-rank oracle over the dumped ADC shortlist. */
  val oracle: Map[String, String] = Map(
    "nq_ivfpq_knn" -> VecPrep.rerankOracleSql("nq_ivfpq_knn"))
}
