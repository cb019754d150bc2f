package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQ8's contract: quantization error is bounded by half a step,
  * constant vectors encode losslessly, the byte kernel agrees with a
  * scalar reimplementation, recall vs the exact q30 is near-perfect
  * (8 bits per dim is a fine grid), and the codes are 4× smaller.
  */
class Sq8KnnSpec extends SparkSpec {
  import spark.implicits._

  test("dequantization error is bounded by scale/2; constants lossless") {
    val vecs = Seq(
      (1L, Array(0.1f, -0.7f, 0.9f, 0.33f)),
      (2L, Array(5f, 5f, 5f, 5f)), // constant: scale degenerate
      (3L, Array(-1e-3f, 1e-3f, 0f, 2e-4f)))
      .toDF("vec_id", "embedding")
    val enc = Sq8Knn.encode(vecs)
      .as[(Long, Array[Byte], Float, Float, Double)].collect()
      .map(r => r._1 -> r).toMap
    val orig = Map(1L -> Array(0.1f, -0.7f, 0.9f, 0.33f),
      2L -> Array(5f, 5f, 5f, 5f),
      3L -> Array(-1e-3f, 1e-3f, 0f, 2e-4f))
    for ((id, (_, codes, mn, scale, _)) <- enc) {
      val dec = codes.map(c => mn + scale * (c & 0xff))
      orig(id).zip(dec).foreach { case (v, dv) =>
        assert(math.abs(v - dv) <= scale / 2 + 1e-7,
          s"vec $id: $v decoded as $dv (scale $scale)")
      }
    }
    // constant vector: mx == mn, every code 0, decoded exactly
    val (_, c2, mn2, _, _) = enc(2L)
    assert(c2.forall(_ == 0) && mn2 === 5f)
  }

  test("sq8_dot matches a scalar reimplementation") {
    graft.functions.VecFunctions.register(spark)
    val q = Array(0.5f, -1.5f, 2f)
    val codes = Array[Byte](3, 200.toByte, 255.toByte)
    val expect = q.zip(codes).map { case (x, c) =>
      x.toDouble * (c & 0xff) }.sum
    val got = Seq((q, codes)).toDF("q", "c")
      .select(expr("sq8_dot(q, c)")).as[Double].head()
    assert(got === expect)
    // dimension mismatch fails loudly
    val e = intercept[Exception] {
      Seq((q, Array[Byte](1, 2))).toDF("q", "c")
        .select(expr("sq8_dot(q, c)")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("recall vs exact q30 is at least 0.95 at 8 bits") {
    val exact = SimQueries.q30KnnExact(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq8 = Sq8Knn.sq8Knn(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(sq8.keySet === exact.keySet)
    val recall = exact.keys.toSeq.map { q =>
      (sq8(q) & exact(q)).size.toDouble / exact(q).size
    }.sum / exact.size
    assert(recall >= 0.95, s"SQ8 recall $recall below 0.95")
  }

  test("codes are 4x smaller than the float vectors") {
    val enc = Sq8Knn.encode(graft.Tables.embeddings(spark, sf0001))
    val row = enc.select(length(col("codes")).as("nb"),
      lit(0)).as[(Int, Int)].head()
    val dim = graft.Tables.embeddings(spark, sf0001)
      .select(size(col("embedding"))).as[Int].head()
    assert(row._1 === dim, "one byte per dimension")
  }
}
