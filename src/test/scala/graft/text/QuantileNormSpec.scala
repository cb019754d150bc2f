package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile normalization: calibrating a group against itself is the
  * exact identity, equal-size groups land on the SAME calibrated set
  * (the transform's defining property), extremes map to the global
  * extremes, and a singleton group pins pct = 0.5.
  */
class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("doc_id", "lang", "n_chars")

  test("one group spanning the corpus: calibrated == score EXACTLY") {
    val out = QuantileNorm.quantileNormalize(
        df((1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 70L)),
        "lang", "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    out.foreach { case (_, (score, calib)) =>
      assert(calib == score.toDouble) // frac is exactly 0 at own rank
    }
  }

  test("equal-size groups map onto the SAME calibrated set (the " +
      "defining property), extremes hit the global extremes") {
    // A's scores 1,2,3 vs B's 101,102,103: wildly different raw
    // scales, identical within-group shapes
    val out = QuantileNorm.quantileNormalize(
        df((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
           (4L, "B", 101L), (5L, "B", 102L), (6L, "B", 103L)),
        "lang", "doc_id", "n_chars")
      .collect().map(r => (r.getString(1), r.getDouble(3), r.getDouble(4)))
    val aSet = out.filter(_._1 == "A").map(_._3).sorted.toSeq
    val bSet = out.filter(_._1 == "B").map(_._3).sorted.toSeq
    assert(aSet === bSet, s"calibrated sets must match: $aSet vs $bSet")
    assert(aSet.head == 1.0 && aSet.last == 103.0,
      "pct 0/1 must map to the global min/max")
  }

  test("singleton group pins pct = 0.5") {
    val out = QuantileNorm.quantileNormalize(
        df((1L, "A", 5L), (2L, "A", 9L), (3L, "solo", 7L)),
        "lang", "doc_id", "n_chars")
      .filter($"lang" === "solo").collect()
    assert(out.length == 1 && out.head.getDouble(3) == 0.5)
  }

  test("approx ≡ exact when the sketch retains everything (n < k)") {
    // 500 docs at sf0.001 all fit level 0 of a k=1024 sketch — no
    // compaction, weights all 1, cw = the exact global ranks — so the
    // approx path must reproduce the exact form EXACTLY, double for
    // double (same interpolation tree over the same order statistics)
    val docs = graft.Tables.documents(spark, sf0001)
    val exact = QuantileNorm.quantileNormalize(
        docs, "lang", "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val (res, items) = QuantileNorm.quantileNormalizeApprox(
      docs, "lang", "doc_id", "n_chars", k = 1024)
    assert(items.count() === docs.count(),
      "n < k must retain every value at weight 1")
    val approx = res.collect().map(r => r.getLong(0) ->
      (r.getDouble(3), r.getDouble(4))).toMap
    assert(approx === exact)
  }

  test("approx stays within the sketch's rank band of exact under real compaction") {
    val sf001 = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf001)
    val k = 64 // 500 docs >> k: compaction genuinely fires
    val (res, _) = QuantileNorm.quantileNormalizeApprox(
      docs, "lang", "doc_id", "n_chars", k = k)
    val exactGlobal = docs.select($"n_chars".cast("double"))
      .orderBy("n_chars").as[Double].collect()
    val n = exactGlobal.length
    val band = math.ceil(4.0 * n / k).toInt // ~4/k rank error budget
    res.select($"pct", $"calibrated").collect().foreach { r =>
      val p = r.getDouble(0) * (n - 1)
      val lo = math.max(0, math.floor(p).toInt - band)
      val hi = math.min(n - 1, math.ceil(p).toInt + band)
      val c = r.getDouble(1)
      assert(c >= exactGlobal(lo) && c <= exactGlobal(hi),
        s"calibrated $c outside rank band [$lo,$hi] = " +
          s"[${exactGlobal(lo)}, ${exactGlobal(hi)}] at p=$p")
    }
  }

  test("approx plan has NO un-partitioned window; the exact form does (non-vacuity)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def globalWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w }
    // the scale claim: the approx plan's only windows are partitioned
    // by lang — nothing ranks the whole corpus through one task
    val approx = graft.SparkEntry.queries("nq_qnorm_approx")(spark, sf0001)
    assert(globalWindows(approx).isEmpty,
      s"approx path must not plan a global window:\n" +
        s"${approx.queryExecution.optimizedPlan}")
    val exact = graft.SparkEntry.queries("q109_quantile_norm")(spark, sf0001)
    assert(globalWindows(exact).nonEmpty,
      "exact form should still rank globally (non-vacuity)")
  }

  test("store-backed calibration: hand-computed lookups, cap at the " +
      "top quantile, singleton group pins 0.5, unknown group is NULL") {
    val groupItems = Map(
      "A" -> Array((10.0, 1L), (20.0, 1L), (30.0, 1L), (40.0, 1L)),
      "B" -> Array((100.0, 1L), (200.0, 1L)),
      "C" -> Array((7.0, 1L)))
    val globalItems = Array((10.0, 1L), (20.0, 1L), (30.0, 1L),
      (40.0, 1L), (100.0, 1L), (200.0, 1L))
    val batch = Seq(
      (7L, "A", 25L),   // cwBelow 2/3 -> interpolate 40..100 at 1/3
      (8L, "B", 50L),   // below everything -> pct 0 -> global min
      (9L, "Z", 1L),    // unknown group -> NULL
      (10L, "B", 300L), // above everything -> pct caps at 1 -> max
      (11L, "C", 99L))  // singleton group -> pct 0.5 -> midpoint 30..40
      .toDF("doc_id", "lang", "n_chars")
    val out = QuantileNorm.calibrateFromSketches(batch, "lang", "doc_id",
        "n_chars", groupItems, globalItems)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getDouble(3),
          r.getDouble(4))))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(close(out(7L).get._1, 2.0 / 3.0) && close(out(7L).get._2, 60.0))
    assert(out(8L).get === ((0.0, 10.0)))
    assert(out(9L) === None)
    assert(out(10L).get === ((1.0, 200.0)))
    assert(close(out(11L).get._1, 0.5) && close(out(11L).get._2, 35.0))
  }

  test("nq_qnorm_store: calibrates exactly the incoming batch, pct in " +
      "[0,1], deterministic across calls") {
    val a = QuantileNorm.nqQnormStore(spark, sf0001).collect()
    val expected = graft.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 7 === 3).count()
    assert(a.length.toLong === expected)
    a.foreach { r =>
      assert(!r.isNullAt(3), "every sf0.001 lang has standing history")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val b = QuantileNorm.nqQnormStore(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("monotone within group: higher raw score never calibrates lower") {
    val out = QuantileNorm.q109QuantileNorm(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byScore = rows.sortBy(r => (r._2, r._3))
      byScore.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3)
        case _ =>
      }
    }
  }
}
