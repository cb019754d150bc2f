package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar-quantized (SQ8) approximate kNN — the 4× compression tier of
  * the ANN family (FAISS's `SQ8` flat index; between the exact float
  * scan q30 and PQ's 32×): each vector is quantized per-vector-affine
  * to one unsigned byte per dimension,
  *
  *   code_i = round((v_i − vmin)/scale),  v_i ≈ vmin + scale·code_i,
  *
  * so the quantized dot product against a FLOAT query factors into
  *
  *   dot(q, v̂) = vmin·Σq + scale·sq8_dot(q, codes)
  *
  * — the per-pair work is one codegen'd byte-array kernel
  * (`functions.Sq8Dot`), the per-vector constants (vmin, scale, the
  * DECODED norm) ride as columns, and the raw floats are only touched
  * again for the exact re-rank of the shortlist (the PqKnn step-4
  * contract). Unlike PQ there is no trained codebook — encoding is a
  * pure per-row function, which makes the encode embarrassingly
  * parallel, incremental by construction, and the whole operator
  * model-free.
  *
  * Scale shape: encode is one narrow pass (no shuffle); scoring scans
  * codes × broadcast queries (4× less I/O than the float scan);
  * shortlist is a per-query bounded window; the exact re-rank joins
  * only shortlist×queries rows back to the floats. Hard-oracled like
  * every ANN variant: the dumped shortlist's exact re-rank tail re-runs
  * in DuckDB (`VecPrep.rerankOracleSql`); recall vs exact q30 and the
  * quantization error bound are spec-pinned.
  */
object Sq8Knn {

  /** (vec_id, codes BINARY, vmin, vscale, dnrm) — dnrm is the norm of
    * the DECODED vector, so shortlist cosines are exact for v̂ (the
    * ranking the codes can actually express). */
  def encode(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        var mn = Float.MaxValue; var mx = Float.MinValue
        var i = 0
        while (i < v.length) {
          if (v(i) < mn) mn = v(i); if (v(i) > mx) mx = v(i); i += 1
        }
        val scale = if (mx > mn) (mx - mn) / 255f else 1f
        val codes = new Array[Byte](v.length)
        var dn = 0.0
        i = 0
        while (i < v.length) {
          val c = math.max(0, math.min(255,
            math.round((v(i) - mn) / scale)))
          codes(i) = c.toByte
          val dec = mn + scale * c
          dn += dec.toDouble * dec
          i += 1
        }
        (id, codes, mn, scale, math.sqrt(dn))
      }
      .toDF("vec_id", "codes", "vmin", "vscale", "dnrm")
  }

  /** Top-k neighbors for the first `nQueries` vectors: SQ8 shortlist →
    * exact float re-rank. */
  def sq8Knn(s: SparkSession, d: String, topK: Int = 5,
      shortlist: Int = 50, nQueries: Int = 10): DataFrame = {
    graft.functions.VecFunctions.register(s)
    val raw = VecPrep.normed(s, d)
    val enc = encode(raw)
    // tiny query projection: float vectors + Σq (the affine term)
    val qdf = raw.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
          "(acc, x) -> acc + CAST(x AS DOUBLE))").as("qsum"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("cos_hat").desc, col("vec_id"))
    val short = enc.crossJoin(broadcast(qdf))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_hat",
        (col("vmin") * col("qsum") +
          col("vscale") * expr("sq8_dot(qe, codes)")) /
          (col("dnrm") * col("qn")))
      .withColumn("rs", row_number().over(wq))
      .filter(col("rs") <= shortlist)
      .select(col("query_id"), col("vec_id").as("cand_id"))
    graft.OracleDump.dump(short,
      s"${VecPrep.AnnOracleDir}/nq_sq8_knn.parquet")
    VecPrep.exactRerank(short, raw,
      qdf.select("query_id", "qe", "qn"), topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_sq8_knn" -> ((s: SparkSession, d: String) => sq8Knn(s, d)))

  /** Exact-re-rank oracle over the dumped SQ8 shortlist. */
  val oracle: Map[String, String] = Map(
    "nq_sq8_knn" -> VecPrep.rerankOracleSql("nq_sq8_knn"))
}
