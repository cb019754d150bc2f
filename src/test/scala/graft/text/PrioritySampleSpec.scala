package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling's contract (Duffield–Lund–Thorup):
  *   - the bounded-heap selection ≡ the naive full-window form;
  *   - τ and ŵ = max(w, τ) follow the definition, with ŵ ≥ w and
  *     every row kept (ŵ = w exactly) when the group fits in k;
  *   - Σ ŵ over the sample is an unbiased estimator of Σ w — checked
  *     by averaging over many seeds;
  *   - selection is layout-invariant (pure function of id and seed);
  *   - the plan keeps the k-bounded ObjectHashAggregate shape, not a
  *     window.
  */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private def docs: DataFrame =
    graft.Tables.t(spark, sf0001, "documents")

  /** Naive reference: same priority column, full window row_number. */
  private def reference(k: Int, seed: Long): DataFrame = {
    val u = (shiftrightunsigned(xxhash64(col("doc_id"), lit(seed)), 11)
      .cast("double") + lit(1.0)) / lit(9007199254740992.0)
    val pr = docs.select(col("lang"), col("doc_id"), col("n_chars"),
      (col("n_chars").cast("double") / u).as("priority"))
    val w = Window.partitionBy("lang")
      .orderBy(col("priority").desc, col("doc_id").desc)
    val rk = pr.withColumn("rank", row_number().over(w))
    val tau = rk.filter(col("rank") === k + 1)
      .select(col("lang"), col("priority").as("tau"))
    rk.filter(col("rank") <= k)
      .join(tau, Seq("lang"), "left")
      .select(col("lang"), col("rank").cast("long"), col("doc_id"),
        col("n_chars"), col("priority"),
        greatest(col("n_chars").cast("double"),
          coalesce(col("tau"), lit(0.0))).as("est_weight"))
  }

  test("bounded-heap selection and weights match the naive window form") {
    val got = PrioritySample.prioritySample(
      docs, "lang", "doc_id", "n_chars", 7, seed = 7L)
      .orderBy("lang", "rank").collect().toSeq
    val want = reference(7, 7L).orderBy("lang", "rank").collect().toSeq
    assert(got == want)
  }

  test("group that fits in k keeps every row with est_weight == weight") {
    val small = Seq(("a", 1L, 10L), ("a", 2L, 30L), ("b", 3L, 5L))
      .toDF("lang", "doc_id", "n_chars")
    val out = PrioritySample.prioritySample(
        small, "lang", "doc_id", "n_chars", 5)
      .select("lang", "doc_id", "n_chars", "est_weight")
      .as[(String, Long, Long, Double)].collect().toSet
    // all three rows survive, each with ŵ = its own weight (τ = 0)
    assert(out == Set(("a", 1L, 10L, 10.0), ("a", 2L, 30L, 30.0),
      ("b", 3L, 5L, 5.0)))
  }

  test("est_weight >= weight and per-rank priorities strictly descend") {
    val out = PrioritySample.prioritySample(
        docs, "lang", "doc_id", "n_chars", 10)
      .select("lang", "rank", "n_chars", "priority", "est_weight")
      .as[(String, Long, Long, Double, Double)].collect()
    out.foreach { case (_, _, w, _, est) => assert(est >= w.toDouble) }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._2).map(_._4)
      byRank.sliding(2).foreach { case Array(a, b) => assert(a > b)
        case _ => () }
    }
  }

  test("sum of est_weight is an unbiased estimator of the group total") {
    val truth = docs.groupBy("lang").agg(sum("n_chars").as("tot"))
      .as[(String, Long)].collect().toMap
    val seeds = (1L to 40L).toSeq
    val ests = seeds.map { sd =>
      PrioritySample.prioritySample(
          docs, "lang", "doc_id", "n_chars", 20, seed = sd)
        .groupBy("lang").agg(sum("est_weight").as("est"))
        .as[(String, Double)].collect().toMap
    }
    truth.foreach { case (lang, tot) =>
      val mean = ests.map(_(lang)).sum / seeds.size
      val rel = math.abs(mean - tot) / tot
      assert(rel < 0.10,
        s"$lang: mean estimate $mean vs true total $tot (rel err $rel)")
    }
  }

  test("null ids and weights are dropped, never sampled") {
    val rows = Seq(("a", Some(1L), Some(10L)), ("a", Some(2L), Some(30L)),
      ("a", None, Some(99L)), ("a", Some(4L), None))
      .toDF("lang", "doc_id", "n_chars")
    val out = PrioritySample.prioritySample(
        rows, "lang", "doc_id", "n_chars", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("selection is layout-invariant") {
    val a = PrioritySample.prioritySample(
      docs, "lang", "doc_id", "n_chars", 15).collect().toSeq
    val b = PrioritySample.prioritySample(
      docs.repartition(7), "lang", "doc_id", "n_chars", 15)
      .orderBy("lang", "rank").collect().toSeq
    assert(a == b)
  }

  test("plans a partial ObjectHashAggregate, never a Window") {
    val df = PrioritySample.q88PrioritySample(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"),
      s"map-side k+1-bounded heaps are the operator's scale story:\n$plan")
    assert(!plan.contains("Window"),
      s"q88 must not fall back to a window rank:\n$plan")
  }
}
