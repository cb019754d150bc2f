package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the q25 stop-shingle frequency cap: a single viral shingle shared
  * by k docs produces k²/2 candidate pairs through the inverted-index
  * self-join — the classic skew blow-up. The cap drops shingles with
  * document frequency > maxDf BEFORE the join, keeping the candidate set
  * linear in the true near-dups.
  */
class TextSkewSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs of the form "hot1 hot2 hot3 u_i": every doc shares the viral
  // shingle "hot1 hot2 hot3" and owns one unique shingle "hot2 hot3 u_i"
  // → pairwise jaccard 1/3 ≥ 0.1, so WITHOUT the cap all k(k-1)/2 pairs
  // survive to the output; WITH the cap the viral shingle is dropped and
  // no pair remains.
  private val k = 40
  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("skewdocs").toString
    (0 until k).map(i => (i.toLong, s"hot1 hot2 hot3 u$i"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hot shingle without cap explodes to k^2/2 pairs (the failure mode)") {
    val uncapped = TextQueries.q25NeardupJaccard(spark, fixtureDir,
      maxDf = Int.MaxValue)
    assert(uncapped.count() === k.toLong * (k - 1) / 2)
  }

  test("frequency cap keeps the candidate set linear under a hot shingle") {
    val capped = TextQueries.q25NeardupJaccard(spark, fixtureDir, maxDf = 5)
    assert(capped.count() === 0L)
  }

  test("default cap is inert on the real corpus (oracle unaffected)") {
    // sf0.001 max shingle df << 100, so the capped and uncapped plans
    // must agree row-for-row — the cap only engages under true skew
    val a = TextQueries.q25NeardupJaccard(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val b = TextQueries.q25NeardupJaccard(spark, sf0001, maxDf = Int.MaxValue)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }
}
