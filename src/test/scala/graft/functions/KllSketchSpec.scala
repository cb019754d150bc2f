package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The KLL sketch's contract: total weight is conserved EXACTLY through
  * any amount of compaction and merging (that invariant is what the
  * oracle pins against raw tables), small inputs are retained exactly,
  * rank error stays in the 1/k class at 200k rows, and a weighted
  * insert means exactly "that many copies".
  */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  /** splitmix64 — deterministic pseudo-uniform test data. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sketchOf(vals: Seq[Double], k: Int = 256)
      : Seq[(Double, Long)] = {
    graft.functions.VecFunctions.register(spark)
    vals.toDF("v")
      .agg(expr(s"kll_sketch(v, 1L, $k)").as("sk"))
      .select(explode($"sk").as("it"))
      .select($"it.v", $"it.w").as[(Double, Long)]
      .collect().toSeq
  }

  /** The estimator rule: smallest v with cw·den ≥ num·N. */
  private def quantile(items: Seq[(Double, Long)], num: Int, den: Int)
      : Double = {
    val sorted = items.sortBy(identity)
    val n = items.map(_._2).sum
    var cw = 0L
    sorted.find { case (_, w) => cw += w; cw * den >= n * num }.get._1
  }

  test("under-capacity input is retained exactly") {
    val vals = (1 to 100).map(_.toDouble)
    val got = sketchOf(vals)
    assert(got.map(_._1).sorted === vals && got.forall(_._2 == 1L))
    assert(quantile(got, 1, 2) === 50.0)
    assert(quantile(got, 9, 10) === 90.0)
  }

  test("weight conservation is exact at 200k rows") {
    val n = 200000
    // deterministic pseudo-random uniform values
    val vals = (0 until n).map(i =>
      (mix64(i.toLong) >>> 11).toDouble / (1L << 53))
    val got = sketchOf(vals)
    assert(got.map(_._2).sum === n.toLong,
      "sum of retained weights must equal the row count exactly")
    assert(got.length < 3000,
      s"retained ${got.length} items — compaction not engaging")
  }

  test("rank error at 200k uniform rows stays in the 1/k class") {
    val n = 200000
    val vals = (0 until n).map(i =>
      (mix64(i.toLong) >>> 11).toDouble / (1L << 53))
    val got = sketchOf(vals)
    for ((q, num, den) <- Seq((0.5, 1, 2), (0.9, 9, 10), (0.99, 99, 100))) {
      val est = quantile(got, num, den)
      // uniform on [0,1): the value IS its own rank fraction
      assert(math.abs(est - q) <= 0.03,
        s"p${(q * 100).toInt}: estimated $est, rank error > 3%")
    }
  }

  test("merging partitioned halves conserves weight and accuracy") {
    graft.functions.VecFunctions.register(spark)
    val n = 100000
    val df = (0 until n).map(i =>
      (i % 7, (mix64(i.toLong) >>> 11).toDouble
        / (1L << 53))).toDF("part", "v")
    // per-part sketches, then re-fed as weighted items (the merge path)
    val merged = df.groupBy("part")
      .agg(expr("kll_sketch(v, 1L, 256)").as("sk"))
      .select(explode($"sk").as("it"))
      .select($"it.v".as("v"), $"it.w".as("w"))
      .agg(expr("kll_sketch(v, w, 256)").as("sk"))
      .select(explode($"sk").as("it"))
      .select($"it.v", $"it.w").as[(Double, Long)].collect().toSeq
    assert(merged.map(_._2).sum === n.toLong)
    assert(math.abs(quantile(merged, 1, 2) - 0.5) <= 0.04)
    assert(math.abs(quantile(merged, 99, 100) - 0.99) <= 0.04)
  }

  test("a weighted insert means exactly that many copies") {
    graft.functions.VecFunctions.register(spark)
    val weighted = Seq((1.0, 13L), (2.0, 5L), (3.0, 82L))
    val expanded = weighted.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }
    val viaW = weighted.toDF("v", "w")
      .agg(expr("kll_sketch(v, w, 256)").as("sk"))
      .select(explode($"sk").as("it"))
      .select($"it.v", $"it.w").as[(Double, Long)].collect().toSeq
    assert(viaW.map(_._2).sum === expanded.length.toLong)
    for ((num, den) <- Seq((1, 2), (9, 10), (99, 100)))
      assert(quantile(viaW, num, den) ===
        quantile(expanded.map((_, 1L)), num, den))
  }

  test("analysis-time guards: bad k, bad types") {
    graft.functions.VecFunctions.register(spark)
    val df = Seq(1.0).toDF("v")
    for (bad <- Seq("kll_sketch(v, 1L, 4)", "kll_sketch(v, 1L, NULL)",
        "kll_sketch(CAST(1 AS STRING), 1L, 256)",
        "kll_sketch(v, 0.5, 256)")) {
      val e = intercept[Exception](df.agg(expr(bad)).collect())
      assert(e.getMessage.toLowerCase.contains("kll_sketch")
        || e.getMessage.contains("DATATYPE_MISMATCH"),
        s"$bad: unexpected error ${e.getMessage.take(120)}")
    }
  }
}
