package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The profiler's contract on a hand-auditable fixture: null/distinct
  * accounting, numeric channels for numeric columns only, approx mode
  * within the HLL band, and one-aggregate-job planning.
  */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (Some(1L), Some(2.0), Some("a")),
    (Some(2L), None, Some("b")),
    (None, Some(4.0), Some("a")),
    (Some(2L), Some(6.0), None))
    .toDF("k", "x", "s")

  test("hand fixture: counts, nulls, distincts, numeric stats") {
    val p = Profiler.profile(fixture, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("k", "x", "s"))
    val k = p("k")
    assert(k.getLong(2) === 4L && k.getLong(3) === 1L && k.getLong(4) === 2L)
    assert(k.getDouble(5) === 1.0 && k.getDouble(6) === 2.0)
    val x = p("x")
    assert(x.getLong(3) === 1L && x.getDouble(7) === 4.0) // avg(2,4,6)
    val sRow = p("s")
    assert(sRow.getLong(4) === 2L && sRow.isNullAt(5) && sRow.isNullAt(7))
  }

  test("approx mode tracks exact within the KMV error band on real data") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val exact = Profiler.profile(li, exactDistinct = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profiler.profile(li)
      .select("col_name", "n_distinct_est").as[(String, Double)]
      .collect().toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) / math.max(1, n) <= 0.05,
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }

  test("approx kernel (r20 fused pass) matches the exact path on every " +
      "shared stat, and under-full sketches ARE the exact distincts") {
    // same fixture incl. nulls: n_rows/n_null/min/max/avg must be
    // bit-identical between the declarative exact aggregate and the
    // typed-kernel approx pass; with far fewer than k distinct values
    // the KMV sketch is complete, so n_distinct_est = exact n_distinct
    val exact = Profiler.profile(fixture, exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = Profiler.profile(fixture)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    for (c <- exact.keySet) {
      val (e, a) = (exact(c), approx(c))
      assert(a.getLong(2) === e.getLong(2), s"$c n_rows")
      assert(a.getLong(3) === e.getLong(3), s"$c n_null")
      assert(a.getDouble(4) === e.getLong(4).toDouble, s"$c distinct")
      for (i <- 5 to 7)
        assert((a.isNullAt(i) && e.isNullAt(i)) ||
          a.getDouble(i) === e.getDouble(i), s"$c stat col $i")
    }
    // an all-null column exercises the empty min/max/avg/sketch arms
    val withNull = fixture.withColumn("z", lit(null).cast("double"))
    val nz = Profiler.profile(withNull)
      .collect().map(r => r.getString(0) -> r).toMap.apply("z")
    assert(nz.getLong(3) === 4L && nz.getDouble(4) === 0.0 &&
      nz.isNullAt(5) && nz.isNullAt(6) && nz.isNullAt(7))
  }

  test("the approx profile is one aggregate job (no EXPAND)") {
    val plan = Profiler.profile(graft.Tables.lineitem(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "approx mode must not multiply the scan per distinct column")
  }
}
