package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** χ² cells: independence gives exactly zero contributions, the
  * decomposition matches a hand-computed table, structural zero cells
  * are present and contribute their expected count, and the cell sum
  * reproduces the classic statistic.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly independent table: every contribution is exactly 0") {
    // P(a,x) = P(a)P(x) by construction: rows 2:1 across a/b, cols
    // 1:2 across x/y, all four cells filled proportionally
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(40)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val out = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .select("contrib").as[Double].collect()
    assert(out.length == 4 && out.forall(_ == 0.0))
  }

  test("hand-computed 2x2 decomposition, including the statistic") {
    // obs: (a,x)=10 (a,y)=20 (b,x)=30 (b,y)=40; N=100
    // e(a,x)=30*40/100=12, e(a,y)=30*60/100=18, e(b,x)=28, e(b,y)=42
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val cells = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(cells(("a", "x"))._4 == 12.0 && cells(("b", "y"))._4 == 42.0)
    val chi2 = cells.values.map(_._5).sum
    val want = math.pow(10 - 12, 2) / 12 + math.pow(20 - 18, 2) / 18 +
      math.pow(30 - 28, 2) / 28 + math.pow(40 - 42, 2) / 42
    assert(math.abs(chi2 - want) < 1e-12)
  }

  test("structural zero cells appear with contribution = expected") {
    // (b,x) never observed: the dense grid must still test it
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "y"))
    val cells = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(cells.size == 4)
    val zero = cells(("b", "x"))
    assert(zero._3 == 0L)
    // obs=0 → (0−e)²/e = e
    assert(zero._5 == zero._4)
  }

  test("null categories are dropped from the table, not half-counted") {
    val rows: Seq[(String, String)] =
      Seq(("a", "x"), ("a", "y"), (null, "x"), ("b", null), ("b", "y"))
    val cells = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .as[(String, String, Long, Double, Double)].collect()
    // only the 3 complete observations remain; N = 3 via the expecteds
    assert(cells.map(_._3).sum == 3)
    assert(cells.forall(c => c._1 != null && c._2 != null))
  }

  test("hopping windows: every event lands in exactly size/slide windows") {
    val out = Stats.q94HoppingWindows(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    val nEvents = graft.Tables.events(spark, sf0001).count()
    assert(out.map(_._3).sum == 4 * nEvents,
      "1h windows every 15min → 4 memberships per event")
    assert(out.forall(_._2 % 900 == 0), "starts slide-aligned")
  }

  test("retention cohorts: hand fixture and triangle invariants") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // u1 first-active week 0, returns week 2; u2 first-active week 1
    val rows = Seq((1L, 100L), (1L, 604800L * 2 + 5), (2L, 604800L + 9))
      .map { case (u, sec) => Row(u, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec))) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType))))
    df.createOrReplaceTempView("stats_cohort_fixture")
    val uw = df.select(col("user_id"),
      expr("unix_timestamp(ts) div 604800").as("wk")).distinct()
    val cohort = uw.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val cells = uw.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("off"))
      .agg(countDistinct("user_id").as("n"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(cells == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L))
    // real data: offsets non-negative, offset-0 row is each cohort's
    // maximum (nobody can return before joining)
    val real = Stats.q95RetentionCohorts(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(real.nonEmpty && real.forall(_._2 >= 0))
    real.groupBy(_._1).foreach { case (_, rs) =>
      val byOff = rs.map(r => r._2 -> r._3).toMap
      assert(byOff(0L) == rs.map(_._3).max)
    }
  }

  test("session paths: hand fixture with a session break") {
    // fixture rides the real events table's columns through a temp
    // parquet dir so the contract chain (Tables.events normalization)
    // is bypassed and q96's internals are exercised directly
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sec = (s: Long) => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(s))
    // user 1: a b a b (10s apart) | 31-min gap | c c c
    val evs = Seq(
      (1L, "a", 0L), (2L, "b", 10L), (3L, "a", 20L), (4L, "b", 30L),
      (5L, "c", 30L + 1860L), (6L, "c", 30L + 1870L),
      (7L, "c", 30L + 1880L),
      // user 2: only two events — too short to path
      (8L, "a", 0L), (9L, "b", 5L))
    val rows = evs.map { case (id, t, s0) =>
      Row(id, sec(s0), if (id <= 7L) 1L else 2L, t, 0.0, "{}") }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("q96fix")
    try {
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Stats.q96SessionPaths(spark, dir.toString)
        .select("path", "n_occurrences").as[(String, Long)].collect().toSet
      assert(got == Set(("a>b>a", 1L), ("b>a>b", 1L), ("c>c>c", 1L)),
        s"got $got")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("session paths on real events: deterministic, bounded, ranked") {
    val a = Stats.q96SessionPaths(spark, sf0001)
      .as[(String, Long, Int)].collect().toSeq
    val b = Stats.q96SessionPaths(spark, sf0001)
      .as[(String, Long, Int)].collect().toSeq
    assert(a == b && a.nonEmpty && a.size <= 15)
    assert(a.map(_._2).sliding(2).forall {
      case Seq(x, y) => x >= y; case _ => true })
  }

  test("contract query covers the full type x hour grid") {
    val out = Stats.q92Chi2Cells(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    val types = out.map(_._1).distinct.length
    val hours = out.map(_._2).distinct.length
    assert(out.length == types * hours, "grid must be dense")
    assert(out.forall(_._5 >= 0.0))
  }
}
