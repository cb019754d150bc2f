package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BoundedTopK (`top_k`): agreement with the window-rank form, layout
  * independence (the partial-heap merge), serialize/deserialize of the
  * spill path, null handling, and the plan shape that justifies the
  * operator (ObjectHashAggregate with a partial phase, no Window).
  */
class BoundedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def q80 = graft.rel.RelQueries.q80TopKAgg(spark, sf0001)

  test("top_k equals the window-rank top-k, ties broken identically") {
    val agg = q80.collect().map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val win = graft.Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy($"o_custkey", $"o_totalprice".desc, $"o_orderkey".desc)
      .collect().map(_.toSeq)
    assert(agg.nonEmpty && agg.toSeq === win.toSeq)
  }

  test("result is invariant to input partitioning (heap merge is total)") {
    graft.functions.VecFunctions.register(spark)
    val base = graft.Tables.orders(spark, sf0001)
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select($"o_custkey", struct($"o_totalprice", $"o_orderkey").as("sv"))
      .groupBy("o_custkey").agg(expr("top_k(sv, 3)").as("top"))
      .select($"o_custkey", explode($"top").as("t"))
      .orderBy($"o_custkey", $"t.o_totalprice".desc, $"t.o_orderkey".desc)
      .collect().map(_.toSeq)
    val a = run(base.repartition(1))
    val b = run(base.repartition(17, $"o_orderkey"))
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("serialize/deserialize round-trips the heap (spill path)") {
    val f = BoundedTopK(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.Literal(3))
    val buf = f.createAggregationBuffer()
    Seq(5L, 1L, 9L, 7L, 3L).foreach { v =>
      f.update(buf, org.apache.spark.sql.catalyst.InternalRow(v))
    }
    val back = f.deserialize(f.serialize(buf))
    assert(back.sortedDesc.toSeq === Seq(9L, 7L, 5L))
    // merging the round-tripped heap into a fresh one preserves contents
    val merged = f.merge(f.createAggregationBuffer(), back)
    assert(merged.sortedDesc.toSeq === Seq(9L, 7L, 5L))
  }

  test("null inputs are skipped; a small group returns fewer than k") {
    graft.functions.VecFunctions.register(spark)
    val out = Seq((1L, Some(10L)), (1L, None), (2L, Some(5L)))
      .toDF("g", "v")
      .groupBy("g").agg(expr("top_k(v, 3)").as("top"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) === Seq(10L))
    assert(out(1).getSeq[Long](1) === Seq(5L))
  }

  test("k must be a positive literal") {
    graft.functions.VecFunctions.register(spark)
    val df = Seq((1L, 2L)).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(expr("top_k(v, 0)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("top_k(v, v)")).collect()
    }
    // NULL k is an analysis-time type error, not a runtime crash from
    // the lazy k evaluation
    val eNull = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(expr("top_k(v, CAST(NULL AS INT))")).collect()
    }
    assert(eNull.getMessage.contains("NULL"))
  }

  test("a huge k does not pre-allocate a k-sized buffer per group") {
    graft.functions.VecFunctions.register(spark)
    // with the old `new PriorityQueue(k)` this allocates a 2B-element
    // array per group buffer and OOMs before any data arrives
    val out = Seq((1L, 10L), (1L, 7L), (2L, 5L)).toDF("g", "v")
      .groupBy("g").agg(expr("top_k(v, 2000000000)").as("top"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) === Seq(10L, 7L))
    assert(out(1).getSeq[Long](1) === Seq(5L))
  }

  test("heap property: any inputs, any k, any split — sort-take-k, merge-total") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val ord = implicitly[Ordering[Long]].asInstanceOf[Ordering[Any]]
    val prop = forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) { (xs, k, cutPct) =>
      val expected = xs.sorted(Ordering[Long].reverse).take(k)
      val whole = new BoundedTopK.Heap(k, ord)
      xs.foreach(whole.offer(_))
      // and split at an arbitrary point, fill two heaps, merge
      val cut = xs.length * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      val a = new BoundedTopK.Heap(k, ord)
      val b = new BoundedTopK.Heap(k, ord)
      l.foreach(a.offer(_)); r.foreach(b.offer(_))
      b.foreach(a.offer)
      whole.sortedDesc.toSeq == expected &&
        a.sortedDesc.toSeq == expected
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("q80 plans a partial ObjectHashAggregate, never a Window") {
    val df = q80
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"top_k should run in ObjectHashAggregateExec:\n$plan")
    assert(plan.contains("partial_top_k"),
      s"map-side partial heaps are the operator's whole point:\n$plan")
    assert(!plan.contains("Window"),
      s"q80 must not fall back to a window rank:\n$plan")
  }
}
