package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over the `embeddings` table (SURVEY.md §2.K).
  *
  * Layers:
  *  - q30: brute-force cosine top-k — the exact baseline. The (small)
  *    query set is broadcast; candidates stream through a narrow map —
  *    no shuffle until the per-query top-k, which AQE keeps tiny.
  *  - q31: all-pairs near-duplicate by cosine — exact backstop; the
  *    sub-quadratic path is the LSH variant (nq_knn_lsh in NoOracle).
  *  - q32: per-label centroids — the coarse-quantizer training step of
  *    an IVF index (k-means-style assignment would iterate this).
  *
  * Cosine is computed in DOUBLE (cast from the stored FLOAT) with the
  * native codegen'd `vec_dot` expression (graft.functions.FloatVecDot) —
  * same sequential accumulation order as DuckDB's
  * list_cosine_similarity, so rounded values match the oracle. Vector
  * norms are computed ONCE per row before the pair join (not per pair).
  */
object SimQueries {

  // ---------------------------------------------------------------- q30
  // Exact k-NN: top-5 cosine neighbors for each of the first 10 vectors.
  // (vec_id, embedding, nrm) prep and the top-k tail are the shared
  // VecPrep definitions every ANN variant compares against.
  def q30KnnExact(s: SparkSession, d: String): DataFrame = {
    val e = VecPrep.normed(s, d)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    VecPrep.topKCosine(
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (expr("vec_dot(embedding, qe)") / (col("nrm") * col("qn")))
            .as("cos")),
      topK = 5)
  }

  val q30Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce
      |      FROM embeddings),
      |p AS (SELECT query_id, neighbor_id,
      |        list_cosine_similarity(qe, ce) AS cos
      |      FROM q, c WHERE neighbor_id <> query_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY cos DESC, neighbor_id) AS rn
      |      FROM p)
      |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rn
      |FROM r WHERE rn <= 5
      |ORDER BY query_id, rn""".stripMargin

  // ---------------------------------------------------------------- q31
  // Embedding near-duplicate pairs: cosine ≥ 0.4 over all i<j pairs.
  // Exact quadratic form — correct at test scale; at 100 TB the same
  // result comes from nq_knn_lsh's bucketed join.
  def q31EmbeddingNeardup(s: SparkSession, d: String): DataFrame = {
    val e = VecPrep.normed(s, d)
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"),
      col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"),
      col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (expr("vec_dot(e1, e2)") / (col("n1") * col("n2"))).as("cos"))
      .filter(col("cos") >= 0.4)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cosine"))
      .orderBy("id1", "id2")
  }

  val q31Sql: String =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[],
      |                               b.embedding::DOUBLE[]), 6) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[],
      |                             b.embedding::DOUBLE[]) >= 0.4
      |ORDER BY id1, id2""".stripMargin

  // ---------------------------------------------------------------- q32
  // Per-label centroids (IVF coarse-quantizer step): posexplode the
  // vector, aggregate per (label, dim). One shuffle keyed (label, dim) —
  // at scale this is the canonical map-side-combinable layout.
  def q32LabelCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("dim"))
      // +0.0 normalizes IEEE −0.0: a signed average an ulp below zero
      // rounds to −0.0 in DuckDB but +0.0 here (same hazard as q52)
      .agg((round(avg(col("v").cast("double")), 6) + lit(0.0)).as("centroid"),
        count(lit(1)).as("n_vectors"))
      .orderBy("label", "dim")

  val q32Sql: String =
    """SELECT label, CAST(i AS BIGINT) AS dim,
      |  round(avg(e[i]), 6) + 0.0 AS centroid, count(*) AS n_vectors
      |FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings) t,
      |  LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
      |GROUP BY label, i
      |ORDER BY label, dim""".stripMargin

  // ---------------------------------------------------------------- q49
  // Cross-modal retrieval: vector kNN joined back to the documents table
  // (vec_id ≡ doc_id in the corpus) — the "semantic search returns text"
  // shape: ANN candidates (here the exact top-k baseline) → broadcast
  // hydration join against the doc store.
  def q49CrossModal(s: SparkSession, d: String): DataFrame = {
    val hits = q30KnnExact(s, d)
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 30).as("preview"))
    // broadcast the HITS (10 queries × 5 rows — constant), never the
    // documents table: the doc store grows with the corpus and a
    // broadcast of it is the driver-OOM-by-construction anti-pattern
    docs.join(broadcast(hits), col("neighbor_id") === col("doc_id"))
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        col("cosine"), col("lang"), col("preview"))
      .orderBy("query_id", "rn")
  }

  val q49Sql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce
      |      FROM embeddings),
      |p AS (SELECT query_id, neighbor_id,
      |        list_cosine_similarity(qe, ce) AS cos
      |      FROM q, c WHERE neighbor_id <> query_id),
      |r AS (SELECT query_id, neighbor_id, cos,
      |        row_number() OVER (PARTITION BY query_id
      |                           ORDER BY cos DESC, neighbor_id) AS rn
      |      FROM p)
      |SELECT query_id, rn, neighbor_id, round(cos, 6) AS cosine,
      |  lang, substr(text, 1, 30) AS preview
      |FROM r JOIN documents ON neighbor_id = doc_id
      |WHERE rn <= 5
      |ORDER BY query_id, rn""".stripMargin

  // ------------------------------------------------- embedding PCA
  /** Embedding dimensionality reduction (rows-only): MLlib PCA 64→8 over
    * the corpus, reporting per-component explained variance — the
    * standard preprocessing step before ANN indexing (shorter vectors →
    * cheaper distance evaluations; variance tells how much recall the
    * truncation costs). Train is one distributed covariance pass; the
    * projection itself would be a narrow matrix multiply per row.
    */
  def embeddingPca(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    val vecs = embeddings(s, d)
      .select(array_to_vector(col("embedding")).as("v"))
    val model = new PCA().setK(k).setInputCol("v").setOutputCol("p")
      .fit(vecs)
    if (graft.OracleDump.enabled) {
      // the eigendecomposition is the engine half; its BASIS dumps as
      // data and the oracle re-derives each ratio from first principles
      // over the embeddings table itself: var_samp of the projection
      // onto component j IS the eigenvalue (w'Cw for a unit
      // eigenvector), and Σ per-dimension var_samp IS the trace = the
      // eigenvalue total MLlib normalizes by — so a wrong basis, a
      // non-unit vector, or a mis-normalized ratio all hash-mismatch
      val pc = model.pc
      graft.OracleDump.dump(
        (0 until pc.numCols).map { j =>
          (j.toLong, (0 until pc.numRows).map(i => pc(i, j)))
        }.toDF("component", "basis"),
        s"$PcaOracleDumpDir/pca_basis.parquet")
    }
    model.explainedVariance.toArray.zipWithIndex
      .map { case (ev, i) => (i.toLong, BigDecimal(ev).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSeq.toDF("component", "explained_variance")
      .orderBy("component")
  }

  private[graft] val PcaOracleDumpDir = "/tmp/graft_pca_oracle"

  // nq_embedding_pca: explained-variance ratios re-derived by DuckDB
  // from the dumped basis + the embeddings table (see embeddingPca).
  private def pcaSql: String =
    s"""WITH b AS (SELECT * FROM
       |  read_parquet('$PcaOracleDumpDir/pca_basis.parquet/*.parquet')),
       |e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       |proj AS (
       |  SELECT b.component,
       |    var_samp(list_dot_product(e.v, b.basis)) AS pv
       |  FROM e CROSS JOIN b GROUP BY 1),
       |d AS (SELECT unnest(range(1, (SELECT max(len(v)) FROM e) + 1)) AS i),
       |dims AS (
       |  SELECT d.i, var_samp(e.v[d.i]) AS dv FROM e CROSS JOIN d
       |  GROUP BY 1),
       |tot AS (SELECT sum(dv) AS t FROM dims)
       |SELECT p.component, round(p.pv / tot.t, 6) AS explained_variance
       |FROM proj p CROSS JOIN tot
       |ORDER BY component""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_embedding_pca" -> ((s: SparkSession, d: String) => embeddingPca(s, d)),
    "q49_cross_modal" -> q49CrossModal _,
    "q30_knn_exact" -> q30KnnExact _,
    "q31_embedding_neardup" -> q31EmbeddingNeardup _,
    "q32_label_centroids" -> q32LabelCentroids _)

  val oracle: Map[String, String] = Map(
    "q49_cross_modal" -> q49Sql,
    "q30_knn_exact" -> q30Sql,
    "q31_embedding_neardup" -> q31Sql,
    "q32_label_centroids" -> q32Sql,
    "nq_embedding_pca" -> pcaSql)
}
