package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** r19 review sweep (RelQueries/Stats): pinned null-event semantics.
  * The driver fixtures are null-free, so these divergences were
  * latent — each one an engines-disagree (or oracle-crash) case the
  * r18 null-hardening class documented: Spark windows order nulls
  * FIRST where DuckDB orders them LAST, concat_ws skips nulls where
  * `||` propagates them, and session_window drops null timestamps
  * outright. The pinned rule everywhere: null-ts (and for paths,
  * null-typed) events do not sessionize / bucket / path — enforced
  * by explicit filters on BOTH engines.
  */
class NullEventsParitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def sec(s: Long): java.sql.Timestamp =
    new java.sql.Timestamp(s * 1000L)

  private def withEvents[T](rows: Seq[Row])(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("nullev")
    try {
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      f(dir.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def ev(id: Long, ts: java.sql.Timestamp, u: Long, t: String,
      v: Double = 1.0, props: String = """{"k": 1}"""): Row =
    Row(id, ts, u, t, v, props)

  test("sessionize/session_window/session_paths: null-ts events do " +
      "not sessionize — results equal the null-free subset's") {
    val base = Seq(
      ev(1L, sec(0L), 1L, "a"), ev(2L, sec(600L), 1L, "b"),
      ev(3L, sec(5000L), 1L, "c"), ev(4L, sec(5600L), 1L, "d"),
      ev(5L, sec(0L), 2L, "a"), ev(6L, sec(100L), 2L, "b"))
    val nulls = Seq(
      ev(7L, null, 1L, "x"), ev(8L, null, 1L, "y"),
      ev(9L, null, 2L, "z"))
    def all(d: String) = (
      RelQueries.q16Sessionize(spark, d).collect().map(_.toSeq).toSeq,
      RelQueries.q26SessionWindowBatch(spark, d).collect()
        .map(_.toSeq).toSeq,
      Stats.q96SessionPaths(spark, d).collect().map(_.toSeq).toSeq)
    val clean = withEvents(base)(all)
    val dirty = withEvents(base ++ nulls)(all)
    assert(dirty._1 === clean._1,
      "q16: a null-ts event must not open or extend a session")
    assert(dirty._2 === clean._2,
      "q26: the lag/cumsum oracle rewrite and session_window must " +
        "agree on dropping null timestamps")
    assert(dirty._3 === clean._3,
      "q96: null-ts events must not enter any path")
  }

  test("session paths: a null event_type never yields a 2-gram " +
      "disguised as a trigram (concat_ws-skips-nulls divergence)") {
    val rows = Seq(
      ev(1L, sec(0L), 1L, "a"), ev(2L, sec(10L), 1L, null),
      ev(3L, sec(20L), 1L, "c"), ev(4L, sec(30L), 1L, "d"))
    withEvents(rows) { d =>
      val paths = Stats.q96SessionPaths(spark, d)
        .select("path").as[String].collect().toSet
      // the null-typed event vanishes from the sequence (pinned rule):
      // the remaining a,c,d forms exactly one trigram — and never the
      // "a>c" 2-gram concat_ws would have forged
      assert(paths === Set("a>c>d"), s"got $paths")
    }
  }

  test("busiest hour: a null hour bucket tying the max loses the " +
      "tie-break on both engines (asc_nulls_last)") {
    val rows = Seq(
      ev(1L, null, 1L, "t"), ev(2L, null, 1L, "t"),
      ev(3L, sec(7200L), 1L, "t"), ev(4L, sec(7210L), 1L, "t"))
    withEvents(rows) { d =>
      val got = RelQueries.q19BusiestHour(spark, d).collect()
      assert(got.length === 1 && !got.head.isNullAt(1) &&
        got.head.getLong(1) === 7200L,
        "the real hour must win the tie against the null bucket")
    }
  }

  test("json extract: a props row without a numeric k aggregates as " +
      "null on the Spark side (the oracle mirrors via " +
      "TRY_CAST(nullif(...)))") {
    val rows = Seq(
      ev(1L, sec(0L), 1L, "t", 1.0, """{"k": 5}"""),
      ev(2L, sec(10L), 1L, "t", 1.0, "{}"),
      ev(3L, sec(20L), 1L, "t", 1.0, """{"k": "text"}"""),
      ev(4L, sec(30L), 1L, "t", 1.0, """{"k": "7"}"""))
    withEvents(rows) { d =>
      val r = RelQueries.q14JsonExtract(spark, d).collect().head
      assert(r.getLong(1) === 4L, "all rows count")
      assert(r.getLong(2) === 12L,
        "plain and quoted integers sum; missing/non-numeric are null")
    }
  }
}
