package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q70 heavy hitters: the freqItems candidate sketch must be a
  * semantics-preserving prefilter — the exact verify pass has to yield
  * precisely the naive full-shuffle answer, independent of input
  * layout (the sketch's false-POSITIVE set varies with partitioning;
  * false negatives are impossible, so the verified output must not).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(sfDir: String, support: Double) = {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(lower($"text"), "\\s+")).as("term"))
      .filter(length($"term") > 0)
    val total = toks.count()
    toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .filter($"tf".cast("double") > lit(total.toDouble * support))
      .withColumn("n_tokens", lit(total))
      .select("term", "tf", "n_tokens")
  }

  test("sketch-prefiltered result equals the naive full-shuffle groupBy") {
    val fast = TextQueries.q70HeavyHitters(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    val slow = naive(sf0001, 0.002).as[(String, Long, Long)].collect().toSet
    assert(fast.nonEmpty, "corpus should have at least one heavy hitter")
    assert(fast === slow)
  }

  test("planted dominant terms surface with exact counts; tail terms do not") {
    // 'hot' is 30/60 tokens, 'warm' 12/60; 18 singletons form the tail.
    // support 0.1 → threshold 6.0 strictly exceeded by hot and warm only.
    val text1 = (Seq.fill(15)("hot") ++ Seq.fill(6)("warm") ++
      (0 until 9).map(i => s"tail$i")).mkString(" ")
    val text2 = (Seq.fill(15)("hot") ++ Seq.fill(6)("warm") ++
      (9 until 18).map(i => s"tail$i")).mkString(" ")
    val docs = Seq((0L, text1), (1L, text2)).toDF("doc_id", "text")
    val out = TextQueries.heavyHitters(docs, support = 0.1)
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(("hot", 30L, 60L), ("warm", 12L, 60L)))
  }

  test("output is invariant to input partitioning") {
    val a = TextQueries.q70HeavyHitters(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    val b = TextQueries.heavyHitters(
      graft.Tables.documents(spark, sf0001).repartition(7))
      .as[(String, Long, Long)].collect().toSeq
    assert(a === b)
  }
}
