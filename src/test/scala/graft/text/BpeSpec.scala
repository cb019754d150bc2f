package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bpe: hand-computed merge learning on a fixture (greedy argmax,
  * overlapping pair counts, count-then-lexicographic tie-break, early
  * stop), rank-order encode semantics incl. the cascading fold,
  * concatenation identity, determinism, and the end-to-end stats query
  * on real test data.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge learning on a hand fixture: counts, tie-break, early stop") {
    // types: "aaab"×3, "aab"×2.
    // pair counts (overlapping, weighted): (a,a): 2·3 + 1·2 = 8,
    // (a,b): 3 + 2 = 5 → merge 1 = (a,a).
    // state: [aa,a,b]×3, [aa,b]×2 → counts: (aa,a): 3, (a,b): 3,
    // (aa,b): 2 → tie at 3 → lexicographic: ("a","b") < ("aa","a")
    // → merge 2 = (a,b).
    // state: [aa,ab]×3, [aa,b]×2 → (aa,ab): 3, (aa,b): 2 → merge 3 =
    // (aa,ab). state: [aaab]×3, [aa,b]×2 → (aa,b): 2 ≥ minCount →
    // merge 4 = (aa,b); then no pairs remain → stop.
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("aab")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, nMerges = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq === Seq(
      (1, "a", "a"), (2, "a", "b"), (3, "aa", "ab"), (4, "aa", "b")))
  }

  test("minCount stops learning below the support floor") {
    val docs = Seq((0L, "xy")).toDF("doc_id", "text")
    // the only pair (x,y) occurs once < minCount=2 → no merges
    assert(Bpe.bpeTrain(docs, nMerges = 5).count() === 0)
  }

  test("encode: rank order + cascading left-to-right fold") {
    // merges (a,a) then (aa,a): "aaaa" → pass 1: [aa, aa];
    // pass 2: no (aa,a) adjacency → stays [aa, aa].
    assert(Bpe.encodeWord("aaaa", Seq(("a", "a"), ("aa", "a")))
      === List("aa", "aa"))
    // "aaa" → pass 1: [aa, a] (non-overlapping); pass 2: [aaa]
    assert(Bpe.encodeWord("aaa", Seq(("a", "a"), ("aa", "a")))
      === List("aaa"))
    // cascade inside one pass: merge (a,b) on "aabb" → [a, ab, b]
    // (the fresh "ab" is the next left context but (ab,b) is not the
    // merge being applied)
    assert(Bpe.encodeWord("aabb", Seq(("a", "b")))
      === List("a", "ab", "b"))
    // unknown symbols pass through untouched
    assert(Bpe.encodeWord("zq", Seq(("a", "b"))) === List("z", "q"))
  }

  test("encoding concatenates back to the word (lossless segmentation)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val merges = Bpe.bpeTrain(docs, nMerges = 50)
      .as[(Int, String, String)].collect().toSeq
    val ranked = merges.sortBy(_._1).map { case (_, l, r) => (l, r) }
    val sample = docs.select(
        explode(filter(split(col("text"), "\\s+"), t => length(t) > 0))
          .as("w"))
      .distinct().limit(200).as[String].collect()
    assert(sample.nonEmpty)
    sample.foreach { w =>
      val enc = Bpe.encodeWord(w, ranked)
      assert(enc.mkString === w, s"word '$w' -> $enc")
      assert(enc.forall(_.nonEmpty))
    }
  }

  test("training is deterministic and merges actually compress") {
    val docs = graft.Tables.documents(spark, sf0001)
    val a = Bpe.bpeTrain(docs, nMerges = 30).collect().map(_.toSeq)
    val b = Bpe.bpeTrain(docs, nMerges = 30).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq && a.length === 30)
    val stats = Bpe.q82BpeStats(spark, sf0001, nMerges = 30)
    val row = stats.agg(sum("n_words"), sum("n_bpe_tokens")).collect()(0)
    val (nw, nt) = (row.getLong(0), row.getLong(1))
    // with zero merges tokens = characters; with 30 merges the subword
    // count must sit strictly between words and characters
    assert(nt > nw, "more subwords than words")
    val nChars = docs.select(
        sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .collect()(0).getLong(0)
    assert(nt < nChars, s"merges must compress: $nt !< $nChars")
  }
}
