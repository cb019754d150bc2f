package graft.text

import graft.SparkSpec

/** Hand-computable PMI values and word2phrase behavioral properties. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi matches the hand formula on a tiny corpus") {
    // corpus: "a b" x4, "a c" x4, "c b" x1 -> NU = 18, NB = 9
    val docs = (Seq.fill(4)("a b") ++ Seq.fill(4)("a c") ++ Seq("c b"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = Collocations.pmi(docs, minPair = 1L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // c_a = 8, c_b = 5, c_c = 5; pairs: (a,b)=4, (a,c)=4, (c,b)=1
    val nu = 18.0; val nb = 9.0
    def expect(cxy: Long, cx: Long, cy: Long) =
      BigDecimal(math.log(cxy * nu * nu / (cx.toDouble * cy * nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "b")) === ((4L, 8L, 5L, expect(4, 8, 5))))
    assert(out(("a", "c")) === ((4L, 8L, 5L, expect(4, 8, 5))))
    assert(out(("c", "b")) === ((1L, 5L, 5L, expect(1, 5, 5))))
  }

  test("planted collocation ranks first; cross-doc adjacency is never " +
      "counted; minPair filters the noise floor") {
    // "san francisco" always co-occurs; "the" is everywhere but pairs
    // promiscuously, so its PMI stays low
    val docs = (0 until 20).map(i =>
      (i.toLong, s"the w$i visited san francisco near the w${i + 1}"))
      .toDF("doc_id", "text")
    val top = Collocations.pmi(docs, minPair = 3L, topK = 5).collect()
    // "san francisco" (and its equally-planted neighbours "visited san"
    // / "francisco near", same counts, same PMI) occupy the top; any
    // pair containing "the" must rank strictly below them
    assert(top.map(r => (r.getString(0), r.getString(1)))
      .contains(("san", "francisco")), top.mkString("; "))
    val sf = top.find(r =>
      r.getString(0) == "san" && r.getString(1) == "francisco").get
    assert(top.forall(r => !(r.getString(0) == "the" ||
      r.getString(1) == "the") || r.getDouble(5) < sf.getDouble(5)))
    // every doc ENDS with w{i+1}: if bigrams leaked across docs the
    // pair (w{i+1}, the) would appear 19 times and clear minPair
    val leaked = Collocations.pmi(docs, minPair = 3L, topK = 1000)
      .filter($"w1" rlike "^w\\d+$").filter($"w2" === "the").count()
    assert(leaked === 0L, "no cross-document bigrams")
    // minPair: pairs occurring < 3 times (each w$i pair is unique)
    // never surface
    val rare = Collocations.pmi(docs, minPair = 3L, topK = 1000)
      .filter($"c_xy" < 3).count()
    assert(rare === 0L)
  }

  test("single-token and empty docs contribute unigrams but no bigrams") {
    val docs = Seq((1L, "solo"), (2L, "a b a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Collocations.pmi(docs, minPair = 1L, topK = 10).collect()
    // bigrams only from doc 2: (a,b)x2, (b,a)x1; NU counts "solo" twice
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "a")))
    val ab = out.find(r => r.getString(0) == "a").get
    assert(ab.getLong(2) === 2L && ab.getLong(3) === 2L &&
      ab.getLong(4) === 2L)
  }
}
