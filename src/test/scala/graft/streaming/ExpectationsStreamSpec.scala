package graft.streaming

import graft.SparkSpec
import graft.rel.Expectations._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming expectations store: merge ≡ monolithic over the additive
  * partials, replay a no-op, lineage fenced, Unique rejected. */
class ExpectationsStreamSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    Complete("t", "email"),
    InRange("t", "age", 0.0, 90.0),
    SubsetOf("t", "country", "ref", "code"))

  private lazy val ref = Seq("US", "DE").toDF("code")

  private def rows(xs: (Option[String], Double, String)*) =
    xs.toSeq.toDF("email", "age", "country")

  private val b1 = Seq((Option("a@x"), 10.0, "US"),
    (Option.empty[String], 95.0, "ZZ"))
  private val b2 = Seq((Option("b@x"), 50.0, "DE"),
    (Option("c@x"), 20.0, "US"), (Option.empty[String], -1.0, "QQ"))

  test("streamed batches roll up to the batch suite over the union " +
      "(merge ≡ monolithic), exactly once under replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("expectstream")
    val store = dir.resolve("metrics").toString
    val stream = MemoryStream[(Option[String], Double, String)]
    val q = ExpectationsStream.expectationsIngestStream(
        stream.toDF.toDF("email", "age", "country"), "t", checks,
        Map("ref" -> ref), store)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()

    val rolled = ExpectationsStream.expectationsFromStore(spark, store)
      .collect()
    val mono = validate(
      Map("t" -> rows((b1 ++ b2): _*), "ref" -> ref), checks).collect()
    assert(rolled.toSeq == mono.toSeq,
      s"roll-up ${rolled.toSeq} != monolithic ${mono.toSeq}")
    // planted violations really are in the numbers
    val m = rolled.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m("complete(t.email)") == 2L)
    assert(m("in_range(t.age,0.0,90.0)") == 2L)
    assert(m("subset_of(t.country,ref.code)") == 2L)

    // history: one row set per batch, batch ids 0 and 1
    val hist = ExpectationsStream.metricHistory(spark, store)
    assert(hist.select("batch_id").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))

    // replay of an applied batch id under the same lineage: no-op
    // (identical deterministic file name, identical content)
    val lineage = {
      val src = scala.io.Source.fromFile(s"$store/_lineage")
      try src.mkString.trim finally src.close()
    }
    ExpectationsStream.applyExpectationsBatch(
      rows(b1: _*), 0L, "t", checks, Map("ref" -> ref), store, lineage)
    val after = ExpectationsStream.expectationsFromStore(spark, store)
      .collect()
    assert(after.toSeq == mono.toSeq, "replay must not change the store")
  }

  test("a different lineage over an existing store is fenced off") {
    val dir = java.nio.file.Files.createTempDirectory("expectfence")
    val store = dir.resolve("metrics").toString
    ExpectationsStream.applyExpectationsBatch(
      rows(b1: _*), 0L, "t", checks, Map("ref" -> ref), store, "q-1")
    val e = intercept[IllegalStateException] {
      ExpectationsStream.applyExpectationsBatch(
        rows(b2: _*), 0L, "t", checks, Map("ref" -> ref), store, "q-2")
    }
    assert(e.getMessage.contains("lineage"))
  }

  test("Unique checks are rejected loudly (non-additive)") {
    val e = intercept[IllegalArgumentException] {
      ExpectationsStream.applyExpectationsBatch(
        rows(b1: _*), 0L, "t", Seq(Unique("t", "email")),
        Map.empty, "/tmp/never", "q")
    }
    assert(e.getMessage.contains("not additive"))
  }
}
