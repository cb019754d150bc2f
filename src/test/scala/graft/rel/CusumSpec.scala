package graft.rel

import graft.SparkSpec

/** CUSUM changepoint detection: hand-computable step-shift fixture
  * (every statistic closed-form), the constant-series degenerate case,
  * and the contract entry's shape at sf0.001.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def series(pts: (String, Long, Long)*) =
    pts.toSeq.toDF("k", "x", "y_cents")

  test("step shift: both sides alarm with the closed-form schedule") {
    // 20 points at 100c then 20 at 200c: mu = 150c, sigma = 50c,
    // slack = 25c, threshold = 200c. s− climbs 25c/step through the
    // low half (alarms from step 9, decays 75c/step after the shift,
    // last alarm at step 23); s+ climbs 25c/step through the high half
    // (alarms from step 29 to the end). 27 alarmed points in all.
    val pts = (1L to 20L).map(i => ("a", i, 100L)) ++
      (21L to 40L).map(i => ("a", i, 200L))
    val r = Cusum.cusum(series(pts: _*), "k", "x").collect()(0)
    assert(r.getLong(1) === 40L)            // n_points
    assert(r.getDouble(2) === 1.5)          // mean_val
    assert(r.getDouble(3) === 0.5)          // std_val
    assert(r.getDouble(4) === 5.0)          // max_spos = 20·25c
    assert(r.getDouble(5) === 5.0)          // max_sneg = 20·25c
    assert(r.getLong(6) === 27L)            // alarmed points
    assert(r.getLong(7) === 9L)             // first alarm
  }

  test("an hourly sum whose square overflows Long fails LOUDLY, " +
      "never wraps") {
    // 3.1e9 cents: the value fits a Long but its square exceeds
    // Long.MAX — the DuckDB oracle's BIGINT multiply raises there, so
    // the engine must too (checked math), not silently wrap
    val pts = Seq(("ov", 1L, 3100000000L), ("ov", 2L, 3100000000L))
    val e = intercept[org.apache.spark.SparkException] {
      Cusum.cusum(series(pts: _*), "k", "x").collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected an ArithmeticException cause, got $e")
  }

  test("constant series: sigma 0, cusums flat 0, never alarms") {
    val pts = (1L to 10L).map(i => ("c", i, 500L))
    val r = Cusum.cusum(series(pts: _*), "k", "x").collect()(0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
    assert(r.getLong(6) === 0L)
    assert(r.isNullAt(7), "no alarm => null first_alarm_x")
  }

  test("streaming monitor: split micro-batch delivery equals one batch " +
      "equals the batch monitor; unmodeled keys emit nothing") {
    // the step fixture's self-fit baseline: mu = 150c, sigma = 50c
    val baseline = Map("a" -> (150.0, 50.0))
    val pts = (1L to 20L).map(i => ("a", i, 100L)) ++
      (21L to 40L).map(i => ("a", i, 200L)) ++
      (1L to 40L).map(i => ("zz", i, 999L)) // no baseline -> silent
    val batchAlarms = Cusum.cusumAlarms(
        series(pts: _*), "k", "x", baseline)
      .collect().map(_.toSeq).toSeq
    // closed-form schedule: s- alarms steps 9..23, s+ steps 29..40
    assert(batchAlarms.map(_(1)) ===
      ((9L to 23L) ++ (29L to 40L)).map(x => x: Any))
    assert(!batchAlarms.exists(_(0) == "zz"))

    val dir = java.nio.file.Files.createTempDirectory("cusumstream")
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Long, Long)]
      val q = Cusum.cusumAlarmsStream(
          stream.toDF.toDF("k", "x", "y_cents"), "k", "x", baseline)
        .writeStream.format("memory").queryName("cusum_alarms")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .outputMode("append").start()
      // in-order split delivery: state must carry across the batches
      stream.addData(pts.filter(p => p._1 != "a" || p._2 <= 20))
      q.processAllAvailable()
      stream.addData(pts.filter(p => p._1 == "a" && p._2 > 20))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("cusum_alarms")
        .orderBy("k", "x").collect().map(_.toSeq).toSeq
      assert(streamed === batchAlarms,
        "streamed alarms must equal the batch monitor exactly")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q110 contract entry: one row per event type, deterministic") {
    val a = Cusum.q110Cusum(spark, sf0001).collect()
    val b = Cusum.q110Cusum(spark, sf0001).collect()
    assert(a.length === 5, "five event types")
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) >= 0.0)
      assert(r.getLong(6) >= 0L)
    }
  }
}
