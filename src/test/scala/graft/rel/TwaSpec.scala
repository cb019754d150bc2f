package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-weighted average: last-observation-carried-forward weights,
  * exact micro/cents arithmetic, degenerate series null out, layout
  * cannot change the answer.
  */
class TwaSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Double, Long)]): DataFrame =
    // (user_id, event_id, value, epoch_sec)
    rows.toDF("user_id", "event_id", "value", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .drop("sec")

  private def twaOf(df: DataFrame) =
    Resample.twa(df)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t).toMap

  test("hand-computed holding-interval weights, exactly") {
    // user 1: 1.00 held 10 s, 3.00 held 30 s, 2.00 unweighted tail
    // → (100·10e6 + 300·30e6) / 40e6 / 100 = 2.5 exactly
    val r = twaOf(mk(Seq(
      (1L, 1L, 1.0, 100L), (1L, 2L, 3.0, 110L), (1L, 3L, 2.0, 140L))))
    assert(r(1L) == ((1L, 3L, 40000000L, Some(2.5))))
  }

  test("single-event and empty-span series null the average") {
    val r = twaOf(mk(Seq(
      (1L, 1L, 9.0, 100L), // single event: no holding interval
      (2L, 1L, 5.0, 50L), (2L, 2L, 7.0, 50L)))) // zero total span
    assert(r(1L)._3 == 0L && r(1L)._4.isEmpty)
    assert(r(2L)._3 == 0L && r(2L)._4.isEmpty)
  }

  test("constant series average to the constant exactly") {
    val r = twaOf(mk(Seq(
      (3L, 1L, 4.25, 0L), (3L, 2L, 4.25, 13L), (3L, 3L, 4.25, 99L))))
    assert(r(3L)._4 == Some(4.25))
  }

  test("contract query is layout-invariant on real events") {
    val a = Resample.q91Twa(spark, sf0001).collect().toSeq
    val b = twaOf(graft.Tables.events(spark, sf0001).repartition(11)
      .select("user_id", "event_id", "value", "ts"))
    assert(a.size == b.size && a.nonEmpty)
    a.foreach { row =>
      val u = row.getLong(0)
      val want = (u, row.getLong(1), row.getLong(2),
        Option(row.get(3)).map(_.asInstanceOf[Double]))
      assert(b(u) == want, s"user $u differs under repartition(11)")
    }
  }
}
