package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded word dropout: rate, determinism, subsequence preservation,
  * boundary probabilities. */
class TextAugmentSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, (1 to 2000).map(i => s"w$i").mkString(" ")),
    (2L, "alpha beta gamma"),
    (3L, "solo")
  ).toDF("doc_id", "text")

  test("dropout rate tracks p; decisions are seed-deterministic and " +
      "seed-sensitive") {
    val a = TextAugment.wordDropout(docs, pDropPct = 10).cache()
    val big = a.filter($"doc_id" === 1L).head()
    val rate = 1.0 - big.getAs[Long]("n_kept").toDouble /
      big.getAs[Long]("n_tokens")
    assert(math.abs(rate - 0.10) < 0.03,
      s"dropout rate $rate should track p = 0.10 over 2000 tokens")
    val b = TextAugment.wordDropout(docs, pDropPct = 10)
    assert(b.select("doc_id", "text_aug").collect().toSeq ===
      a.select("doc_id", "text_aug").collect().toSeq,
      "same seed, same augmentation")
    val c = TextAugment.wordDropout(docs, pDropPct = 10, seed = 99L)
      .filter($"doc_id" === 1L).head().getAs[String]("text_aug")
    assert(c !== big.getAs[String]("text_aug"),
      "a different seed draws different tokens")
    a.unpersist()
  }

  test("kept tokens are an ordered subsequence of the original") {
    val out = TextAugment.wordDropout(docs, pDropPct = 30)
      .filter($"doc_id" === 1L).head().getAs[String]("text_aug")
      .split(" ").toSeq
    val orig = (1 to 2000).map(i => s"w$i")
    // every survivor appears, in original order (indices strictly rise)
    val idx = out.map(orig.indexOf(_))
    assert(idx.forall(_ >= 0) && idx === idx.sorted,
      "augmented text must be an ordered subsequence")
  }

  test("p = 0 is the identity; p = 100 drops everything") {
    val id = TextAugment.wordDropout(docs, pDropPct = 0)
      .select("doc_id", "text_aug", "text").collect()
    id.foreach { r =>
      // split+rejoin normalizes whitespace; these fixtures are already
      // single-spaced, so identity is exact
      assert(r.getString(1) === r.getString(2), s"p=0 row $r")
    }
    val none = TextAugment.wordDropout(docs, pDropPct = 100)
    assert(none.filter($"n_kept" =!= 0L).count() === 0)
    assert(none.filter($"text_aug" =!= "").count() === 0,
      "p=100 leaves empty strings, not nulls")
  }
}
