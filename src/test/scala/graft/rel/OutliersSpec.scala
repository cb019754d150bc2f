package graft.rel

import graft.SparkSpec

/** Robustness properties that distinguish median/MAD from mean/stddev
  * scoring. */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags a planted wild value; robust to the outlier's own pull " +
      "(breakdown property a mean-based z fails)") {
    // 30 values near 10 plus one at 1000: mean/stddev z of the wild
    // value is ~5.4, but with THREE wild values mean-z collapses
    // (each pulls stddev up); median/MAD flags all three regardless
    val base = (1 to 30).map(i => (1L * i, "g", 10.0 + (i % 5) * 0.1))
    val wild = Seq((101L, "g", 1000.0), (102L, "g", 950.0),
      (103L, "g", 1100.0))
    val df = (base ++ wild).toDF("event_id", "event_type", "value")
    val out = Outliers.madOutliers(df, "event_type", "event_id", "value")
      .collect()
    assert(out.map(_.getLong(1)).toSet == Set(101L, 102L, 103L))
    // classic mean z-score with 3/33 contamination: max |z| ~ 2.6 —
    // below any sane threshold; compute it to prove the contrast
    val vs = (base ++ wild).map(_._3)
    val mean = vs.sum / vs.size
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
    assert(vs.map(v => math.abs((v - mean) / sd)).max < 3.5,
      "mean-based z would have missed these — the point of MAD")
  }

  test("clean groups flag nothing; MAD = 0 groups are excluded by " +
      "contract") {
    val clean = (1 to 40).map(i => (i.toLong, "a", 5.0 + (i % 7) * 0.3))
    // constant-majority group: MAD = 0 → excluded even though one
    // value differs wildly
    val const = (1 to 20).map(i => (100L + i, "b", 1.0)) :+
      ((121L, "b", 99.0))
    val out = Outliers.madOutliers(
      (clean ++ const).toDF("event_id", "event_type", "value"),
      "event_type", "event_id", "value").collect()
    assert(out.isEmpty)
  }

  test("groups are scored independently and nulls dropped") {
    val g1 = (1 to 20).map(i => (i.toLong, "a", Some(10.0 + (i % 3) * 0.2)))
    val g2 = (1 to 20).map(i => (50L + i, "b", Some(1000.0 + (i % 3) * 20.0)))
    val mixed = g1 ++ g2 ++
      Seq((98L, "a", Some(25.0)), (99L, "b", Option.empty[Double]))
    val out = Outliers.madOutliers(
      mixed.toDF("event_id", "event_type", "value"),
      "event_type", "event_id", "value").collect()
    // 25.0 is wild within group a's tight spread, but group b's scale
    // (values ~1000) must not mask it; the null row contributes nothing
    assert(out.map(_.getLong(1)).toSet == Set(98L))
  }
}
