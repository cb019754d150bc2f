package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resample/gap-fill: hand-computed interpolation on a controlled
  * series (interior gaps linear in micro-units, edges null, dense
  * spine), plus structural invariants on the real events corpus.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("twa: a null-valued observation drops (LOCF across the gap) " +
      "instead of counting interval without weight (r18)") {
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    val ev = Seq(
      (7L, 1L, ts(0), Option(100.0)),
      (7L, 2L, ts(10), Option.empty[Double]),
      (7L, 3L, ts(20), Option(100.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val r = Resample.twa(ev).collect().head
    // pre-fix: the null row's 10 s counted in span but added nothing
    // to wsum -> twa 50.0 on a series that never left 100
    assert(r.getAs[Long]("n_events") === 2L, r.toString)
    assert(r.getAs[Double]("twa") === 100.0, r.toString)
  }

  test("hand fixture: dense spine, linear interior gaps, null edges") {
    // one series, 900 s buckets at epochs 0, 2700, 3600 (bidx 0, 3, 4):
    // values 10.0, 40.0, 20.0 → bidx 1 = 10 + (40-10)*1/3 = 20.0,
    // bidx 2 = 30.0. No leading/trailing gap in-range.
    val dir = java.nio.file.Files.createTempDirectory("resample").toString
    Seq(
      (1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(10)),
        7L, "a", 10.0, "{}"),
      (2L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2710)),
        7L, "a", 40.0, "{}"),
      (3L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(3610)),
        7L, "a", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Resample.q84GapFill(spark, dir).collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.toString.toDouble),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, Some(10.0), "obs"),
      (900L, Some(20.0), "interp"),
      (1800L, Some(30.0), "interp"),
      (2700L, Some(40.0), "obs"),
      (3600L, Some(20.0), "obs")))
  }

  test("events corpus: spine is dense per type, src values consistent") {
    val out = Resample.q84GapFill(spark, sf0001).cache()
    // dense: per type, bucket count equals (max-min)/900 + 1
    val spans = out.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        ((max("bucket_start") - min("bucket_start")) / 900 + 1).as("want"))
      .collect()
    spans.foreach(r =>
      assert(r.getLong(1).toDouble === r.getDouble(2), r.toString))
    // src semantics: obs and interp carry values, edge rows are null
    assert(out.filter(col("src") =!= "edge" && col("value").isNull)
      .count() === 0)
    assert(out.filter(col("src") === "edge" && col("value").isNotNull)
      .count() === 0)
    // interpolated values sit within the series' observed range
    val (lo, hi) = {
      val r = out.filter(col("src") === "obs")
        .agg(min("value"), max("value")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    assert(out.filter(col("src") === "interp" &&
      (col("value") < lo || col("value") > hi)).count() === 0)
    out.unpersist()
  }
}
