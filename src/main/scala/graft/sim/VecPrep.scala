package graft.sim

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Shared embedding preparation for the similarity-search family —
  * one definition of each projection so the operators can't drift: the
  * feature prep and the centroid-table construction ARE the claim that
  * the clustering operator is "the standalone form of what IVF trains
  * internally", and the norm/top-k conventions below ARE the contract
  * that every ANN variant's output is comparable to the exact q30.
  */
private[sim] object VecPrep {

  /** (vec_id, embedding, nrm: L2 norm) — the pair-join input every
    * cosine-scoring operator starts from. Norms are computed ONCE per
    * row here, never per pair.
    */
  def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
  }

  /** (vec_id, embedding, v: MLlib vector, nrm: L2 norm) — the input
    * both k-means trainers fit on and both assignment passes scan.
    */
  def embeddingFeatures(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecFunctions.register(s)
    embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("v"),
        sqrt(expr("vec_dot(embedding, embedding)")).as("nrm"))
  }

  /** k rows of (cluster, centroid: float array, cnorm) — tiny by
    * construction (k × dim), safe to broadcast everywhere. cnorm is
    * the norm of the STORED float-cast centroid (not the double-
    * precision trainer output), so downstream cosine/sqdist arithmetic
    * mixes no precisions: the norm belongs to exactly the vector
    * `vec_dot` sees.
    */
  def centroidTable(s: SparkSession, model: KMeansModel): DataFrame =
    centroidTable(s, model.clusterCenters.map(_.toArray.map(_.toFloat)))

  /** Same from plain float-array centroids (the sample-trained-Lloyd
    * builds). */
  def centroidTable(s: SparkSession, cents: Array[Array[Float]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex
      .map { case (cf, i) =>
        (i, cf, math.sqrt(cf.map(x => x.toDouble * x).sum))
      }
      .toSeq.toDF("cluster", "centroid", "cnorm")
  }

  /** The shared output tail of every kNN variant: per-query top-k over
    * (query_id, neighbor_id, cos) pairs with the (cos desc, neighbor_id)
    * tie-break, 6-decimal rounding, (query_id, rn) ordering. One
    * definition so a tie-break or rounding change can't silently
    * diverge the operators' comparable outputs.
    */
  def topKCosine(pairs: DataFrame, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"), col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Fixed absolute dir for the ANN family's oracle-input dumps (see
    * [[graft.OracleDump]]): each approximate-kNN query writes its
    * candidate/shortlist pair set (query_id, cand_id) here during
    * Verify, and its oracle SQL re-runs the EXACT re-rank tail — cosine
    * in DOUBLE, (cos desc, neighbor_id) tie-break, round-6, rn ≤ k — on
    * those pairs with DuckDB. This pins the half of the operator that
    * IS SQL-expressible (the output contract every variant shares with
    * q30) against an independent engine; the approximate candidate
    * GENERATION (probe routing, ADC, codebooks) stays pinned by the
    * recall/determinism/plan specs.
    */
  // def, not val: a TEST JVM that enables OracleDump (NswKnnSpec's
  // candidate-volume bound) must redirect its dumps to a private dir
  // via this property, or a concurrently-running Verify's dump of the
  // SAME fixed path gets clobbered with spec-sized data and the DuckDB
  // compare reads the wrong relation (observed once: parallel
  // `sbt test` + Verify turned nq_nsw_knn red). Verify itself never
  // sets the property, so the driver's sequential flow — and the
  // oracle SQL, built in the same process — keep the fixed path.
  private[sim] def AnnOracleDir: String =
    sys.props.getOrElse("graft.oracle.dump.dir", "/tmp/graft_ann_oracle")

  /** DuckDB oracle for any dumped (query_id, cand_id) relation: exact
    * top-k cosine re-rank — q30's SQL shape restricted to the dumped
    * pairs (the precision parity of `vec_dot` vs
    * `list_cosine_similarity` at round-6 is q30's long-standing
    * contract). */
  private[sim] def rerankOracleSql(name: String, topK: Int = 5): String =
    s"""WITH sl AS (SELECT DISTINCT query_id, cand_id
       |            FROM read_parquet('$AnnOracleDir/$name.parquet/*.parquet')),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |p AS (SELECT sl.query_id, sl.cand_id AS neighbor_id,
       |        list_cosine_similarity(qv.e, cv.e) AS cos
       |      FROM sl JOIN v qv ON qv.vec_id = sl.query_id
       |              JOIN v cv ON cv.vec_id = sl.cand_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |        row_number() OVER (PARTITION BY query_id
       |                           ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM p)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rn
       |FROM r WHERE rn <= $topK
       |ORDER BY query_id, rn""".stripMargin

  /** Exact-cosine re-rank of an ANN shortlist (PQ / IVF-PQ step 4):
    * join (query_id, cand_id) candidates back to the raw vectors, score
    * with the codegen'd vec_dot against the broadcast query set, and
    * take the exact top-k per query.
    *
    * `raw` must carry (vec_id, embedding, nrm); `qdf` is the tiny
    * (query_id, qe, qn) projection of the query vectors.
    */
  def exactRerank(short: DataFrame, raw: DataFrame, qdf: DataFrame,
      topK: Int): DataFrame =
    topKCosine(
      short
        .join(raw.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .join(broadcast(qdf), "query_id")
        .select(col("query_id"), col("cand_id").as("neighbor_id"),
          (expr("vec_dot(embedding, qe)") / (col("nrm") * col("qn")))
            .as("cos")),
      topK)
}
