package graft.text

import graft.SparkSpec

/** BM25 checked against an independent scalar reimplementation on a
  * hand-sized fixture (every quantity — tf, df, dl, avgdl — easy to
  * eyeball), plus the ranking invariants that make it BM25 and not
  * TF-IDF: term saturation (k1) and length normalization (b).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join hash probe build"),
    (2L, "hash join"),
    (3L, "merge sort spill disk merge sort spill disk"),
    (4L, "hash table scan filter scan filter scan filter scan filter"))
    .toDF("doc_id", "text")

  /** Scalar reference: computed with plain Scala arithmetic, not the
    * operator's Column tree. */
  private def ref(query: Seq[String]): Map[Long, Double] = {
    val toks = Map(
      1L -> "hash join hash join hash probe build",
      2L -> "hash join",
      3L -> "merge sort spill disk merge sort spill disk",
      4L -> "hash table scan filter scan filter scan filter scan filter")
      .map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = toks.size
    val avgdl = toks.values.map(_.length).sum.toDouble / n
    toks.flatMap { case (id, ts) =>
      val dl = ts.length
      val score = query.map { q =>
        val tf = ts.count(_ == q)
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(q))
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * tf * (Bm25.K1 + 1.0) /
            (tf + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("scores match the scalar reference to 1e-9") {
    val got = Bm25.bm25TopK(docs, Seq("hash", "filter"), 10,
        scoreDecimals = 9)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val expect = ref(Seq("hash", "filter"))
    assert(got.keySet === expect.keySet)
    expect.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-9, s"doc $id: ${got(id)} vs $s")
    }
  }

  test("term saturation: 3x the tf does not give 3x the score") {
    val scores = ref(Seq("hash"))
    // doc1 has tf=3 at dl=7; doc2 tf=1 at dl=2 — saturation + length
    // normalization must keep doc1 under 3x doc2's contribution scaled
    val d = Seq((1L, "hash a b c d e f"), (2L, "hash hash hash a b c d"))
      .toDF("doc_id", "text")
    val got = Bm25.bm25TopK(d, Seq("hash"), 10, scoreDecimals = 9)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(2L) > got(1L), "more matches must score higher")
    assert(got(2L) < 3.0 * got(1L), "k1 must saturate repeated terms")
  }

  test("length normalization: same tf, shorter doc wins") {
    val d = Seq(
      (1L, "hash join"),
      (2L, "hash join a b c d e f g h i j k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val got = Bm25.bm25TopK(d, Seq("hash"), 10, scoreDecimals = 9)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) > got(2L), "b must penalize the longer document")
  }

  test("docs without any query term never appear") {
    val got = Bm25.bm25TopK(docs, Seq("merge"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }
}
