package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix filtering is an EXACTNESS-critical optimization: a too-short
  * prefix silently loses pairs. So the spec's core is equality against
  * the naive full-inverted-index join on real corpus data (all
  * boundary shapes included), plus the structural claim that pays the
  * rent — the prefix index and its candidate volume are strictly
  * smaller than the full index's.
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, sf0001)

  /** Naive exact form: index EVERY token, group-count intersections,
    * same integer threshold test. */
  private def naive(d: DataFrame, tNum: Int, tDen: Int): Set[(Long, Long)] = {
    val tri = NearDup.hashedShinglesOf(d).cache()
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = tri.as("a").join(tri.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n"))
    val out = inter
      .join(sizes.as("sa"), col("d1") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("d2") === col("sb.doc_id"))
      .filter(col("n") * tDen >= (col("sa.sz") + col("sb.sz") - col("n")) * tNum)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    tri.unpersist()
    out
  }

  test("prefix join equals the naive all-token join at t=0.7") {
    val exact = naive(docs, 7, 10)
    val pref = PrefixJoin.prefixJaccardJoin(docs, 7, 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pref === exact, "prefix filtering must lose and invent nothing")
    assert(exact.nonEmpty, "fixture must exercise the non-trivial case")
  }

  test("prefix join equals the naive join at t=0.5 and t=0.9") {
    for ((n, dd) <- Seq((1, 2), (9, 10))) {
      val exact = naive(docs, n, dd)
      val pref = PrefixJoin.prefixJaccardJoin(docs, n, dd)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(pref === exact, s"mismatch at t=$n/$dd")
    }
  }

  test("exact duplicates pair at jaccard 1.0; disjoint docs never pair") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val got = PrefixJoin.prefixJaccardJoin(d, 7, 10)
      .select("d1", "d2", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0)))
  }

  test("the prefix index is the strictly smaller index") {
    val tri = NearDup.hashedShinglesOf(docs)
    val fullIndex = tri.count()
    // replicate the operator's prefix selection to measure its size
    val dfreq = tri.groupBy("h").agg(count(lit(1)).as("df"))
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val ranked = tri.join(dfreq, "h")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("df", "h")))
      .join(sizes, "doc_id")
    val prefixIndex = ranked.filter(col("rank") <=
      col("sz") - expr("((7 * sz) + 9) div 10") + 1).count()
    // t=0.7 keeps ~30% of each set (+1); demand well under half
    assert(prefixIndex < fullIndex / 2,
      s"prefix index $prefixIndex vs full $fullIndex — filter not engaged")
    assert(prefixIndex > 0)
  }
}
