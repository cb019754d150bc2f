package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Domain KL divergence: identical distributions score exactly zero,
  * a hand-computed split matches the closed form, divergence is
  * non-negative, and a drifted source outranks a representative one.
  */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("a source matching the corpus distribution scores exactly 0") {
    // both sources are "x x y": every ratio is exactly 1.0 → ln = 0.0
    val docs = Seq((1L, "x x y", "a"), (2L, "x x y", "b"))
      .toDF("doc_id", "text", "source")
    val kl = Divergence.domainKl(docs, "source")
      .select("source", "kl").as[(String, Double)].collect().toMap
    assert(kl == Map("a" -> 0.0, "b" -> 0.0))
  }

  test("hand-computed two-source divergence") {
    // source a: x x x y (p = 3/4, 1/4); source b: x y y y
    // corpus:   x:4/8, y:4/8
    val docs = Seq((1L, "x x x y", "a"), (2L, "x y y y", "b"))
      .toDF("doc_id", "text", "source")
    val kl = Divergence.domainKl(docs, "source")
      .select("source", "kl").as[(String, Double)].collect().toMap
    def ref(px: Double, py: Double) =
      (px * math.log(px / 0.5) + py * math.log(py / 0.5) * 1.0)
    val want = math.rint(ref(0.75, 0.25) * 1e6) / 1e6
    assert(math.abs(kl("a") - want) < 2e-6 && math.abs(kl("b") - want) < 2e-6)
  }

  test("KL is non-negative on the real corpus, and sums weights to 1") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Divergence.domainKl(docs, "source")
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, nTerms, nTokens, kl) =>
      assert(kl >= 0.0, s"$src: KL $kl negative")
      assert(nTerms <= nTokens)
    }
  }

  test("a drifted source diverges more than a representative one") {
    // 'rep' mirrors the corpus mix; 'drift' is all-z in a corpus
    // where z is rare
    val docs = Seq(
      (1L, "x y x y x y x y", "rep"),
      (2L, "x y x y x y z z", "bulk"),
      (3L, "z z z z", "drift"))
      .toDF("doc_id", "text", "source")
    val kl = Divergence.domainKl(docs, "source")
      .select("source", "kl").as[(String, Double)].collect().toMap
    assert(kl("drift") > kl("rep"))
  }
}
