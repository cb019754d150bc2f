package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scale property of the columnar sign-LSH: at a realistic dup
  * threshold (cos ≥ 0.9) band collisions between NON-dups are rare, so
  * the candidate set is ~linear in the true dups — the reason this path
  * works at 100 TB where the exact all-pairs join cannot. (The corpus's
  * own q31 task at minCos 0.4 sits below LSH's useful range — that
  * regime is covered by the recall test in NearDupSpec.)
  */
class LshKnnSpec extends SparkSpec {
  import spark.implicits._

  // 400 random 64-d vectors + 20 planted near-dups (a copy of vector i
  // with 2% noise → cos ≈ 0.998). Seeded → deterministic.
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(400)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val dups = (0 until 20).map { i =>
      (400L + i, base(i).map(v => v + 0.02f * rnd.nextGaussian().toFloat))
    }
    val all = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ dups
    graft.functions.VecFunctions.register(spark)
    all.toSeq.toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  test("band-collision candidates are ~linear in true dups at cos>=0.9") {
    // r=8 bits/band: P(non-dup band collision) ≈ 2^-8; with 8 tables the
    // expected noise candidates over 420·419/2 ≈ 88k pairs is ~2.7k ≪ n².
    // A dup at cos .998 collides with probability ≈ 1 in every table.
    val bands = LshKnn.banded(emb, rowsPerBand = 8, nTables = 8, seed = 42L)
    val nCands = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.sig" === $"y.sig" &&
          $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id", $"y.vec_id").distinct().count()
    val allPairs = 420L * 419 / 2
    assert(nCands < allPairs / 10,
      s"candidates $nCands not sub-quadratic (all pairs: $allPairs)")
  }

  test("all planted dups recovered exactly at cos>=0.9, no false positives") {
    val got = LshKnn.lshNeardupOn(emb, minCos = 0.9, rowsPerBand = 8,
        nTables = 8, seed = 42L)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val want = (0 until 20).map(i => (i.toLong, 400L + i)).toSet
    assert(got === want)
  }
}
