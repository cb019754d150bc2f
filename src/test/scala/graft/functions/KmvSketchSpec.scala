package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KmvSketch (`kmv_sketch`): exactness when under-full, distinctness of
  * the retained set, layout independence (set-union merge), the spill
  * path, estimator accuracy vs exact distinct, intersection-estimate
  * accuracy on a planted overlap, argument guards, and the plan shape
  * that justifies the operator (ObjectHashAggregate with a partial
  * phase — ≤ k values per group per partition cross the exchange).
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("under-full sketch IS the exact distinct set, ascending, deduped") {
    graft.functions.VecFunctions.register(spark)
    val out = Seq((1L, 9L), (1L, 3L), (1L, 9L), (1L, -4L), (2L, 7L))
      .toDF("g", "h")
      .groupBy("g").agg(expr("kmv_sketch(h, 8)").as("sk"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) === Seq(-4L, 3L, 9L))
    assert(out(1).getSeq[Long](1) === Seq(7L))
  }

  test("full sketch keeps exactly the k smallest distinct values") {
    graft.functions.VecFunctions.register(spark)
    val vals = (1L to 100L).flatMap(v => Seq(v, v)) // every value twice
    val out = vals.map(("g", _)).toDF("g", "h")
      .groupBy("g").agg(expr("kmv_sketch(h, 10)").as("sk"))
      .collect()
    assert(out(0).getSeq[Long](1) === (1L to 10L))
  }

  test("result is invariant to input partitioning (set-union merge)") {
    graft.functions.VecFunctions.register(spark)
    val base = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag".as("g"), xxhash64($"l_partkey").as("h"))
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("g").agg(expr("kmv_sketch(h, 64)").as("sk"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val a = run(base.repartition(1))
    val b = run(base.repartition(17, $"h"))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("serialize/deserialize round-trips the set (spill path)") {
    val f = KmvSketch(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(3))
    val buf = f.createAggregationBuffer()
    Seq(5L, 1L, 9L, 7L, 1L, 3L).foreach { v =>
      f.update(buf, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    val back = f.deserialize(f.serialize(buf))
    assert(back.sortedAsc.toSeq === Seq(1L, 3L, 5L))
    val merged = f.merge(f.createAggregationBuffer(), back)
    assert(merged.sortedAsc.toSeq === Seq(1L, 3L, 5L))
  }

  test("estimator lands within KMV error bounds of exact distinct") {
    // k=256 → relative standard error ≈ 1/√(k−2) ≈ 6.3%; assert 4σ
    val est = graft.rel.ApproxQueries.kmvDistinct(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.text.NearDup.shingles(spark, sf0001)
      .select($"doc_id", explode($"shingles").as("sg"))
      .join(graft.Tables.documents(spark, sf0001).select("doc_id", "lang"),
        "doc_id")
      .groupBy("lang").agg(countDistinct("sg").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (lang, n) =>
      val e = est(lang)
      assert(math.abs(e - n) <= math.max(0.25 * n, 2.0),
        s"lang=$lang exact=$n est=$e")
    }
  }

  test("intersection estimate recovers a planted overlap, exact when under-full") {
    graft.functions.VecFunctions.register(spark)
    // groups A and B share exactly 500 of 2000 values each; k=256 →
    // both sketches full → estimate within 4σ. Groups C and D share 30
    // of 60 — under-full sketches → the estimate is EXACT.
    val a = (0L until 2000L).map(("A", _))
    val b = (1500L until 3500L).map(("B", _))
    val c = (0L until 60L).map(("C", _))
    val dd = (30L until 90L).map(("D", _))
    val df = (a ++ b ++ c ++ dd).toDF("lang", "x")
      .select($"lang", xxhash64($"x").as("h"))
    val sk = df.groupBy("lang").agg(expr("kmv_sketch(h, 256)").as("sk"))
    // reuse the operator's estimator tail by renaming to its shape
    val u = (cc: org.apache.spark.sql.Column) =>
      (cc.cast("double") + lit(9.223372036854775808e18)) /
        lit(1.8446744073709551616e19)
    def theta(skCol: org.apache.spark.sql.Column) =
      when(size(skCol) < 256, lit(1.0)).otherwise(u(element_at(skCol, 256)))
    val pairs = sk.select($"lang".as("lang_a"), $"sk".as("ska"))
      .join(broadcast(sk.select($"lang".as("lang_b"), $"sk".as("skb"))),
        $"lang_a" < $"lang_b")
      .withColumn("theta", least(theta($"ska"), theta($"skb")))
      .select($"lang_a", $"lang_b",
        (size(filter(array_intersect($"ska", $"skb"),
          x => u(x) < $"theta")).cast("double") / $"theta").as("est"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs(("A", "B")) - 500.0) <= 250.0,
      s"A∩B est=${pairs(("A", "B"))}")
    assert(pairs(("C", "D")) === 30.0) // BOTH sketches complete → exact
    // C ⊂ A, but A's sketch is full → still an estimate: θ = θ_A ≈
    // k/|A| ≈ 0.128 retains ~8 of C's 60 members → σ ≈ √8/θ ≈ 22;
    // assert 4σ
    assert(math.abs(pairs(("A", "C")) - 60.0) <= 88.0,
      s"A∩C est=${pairs(("A", "C"))}")
  }

  test("k must be a positive non-null literal; input must be BIGINT") {
    graft.functions.VecFunctions.register(spark)
    val df = Seq((1L, 2L)).toDF("g", "h")
    intercept[Exception] {
      df.groupBy("g").agg(expr("kmv_sketch(h, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("kmv_sketch(h, h)")).collect()
    }
    val eNull = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(expr("kmv_sketch(h, CAST(NULL AS INT))")).collect()
    }
    assert(eNull.getMessage.contains("NULL"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select($"g", $"h".cast("string").as("s"))
        .groupBy("g").agg(expr("kmv_sketch(s, 4)")).collect()
    }
  }

  test("plan: partial kmv_sketch under ObjectHashAggregate, no Window") {
    val plan = graft.rel.ApproxQueries.kmvDistinct(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_kmv_sketch"), plan.take(800))
    assert(!plan.contains("Window"), "no window form in the sketch path")
  }
}
