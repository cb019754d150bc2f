package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming outlier screen against frozen robust stats. */
class OutlierStreamSpec extends SparkSpec {
  import spark.implicits._

  // calibration window: tight spread around 10 per group
  private lazy val ref = (1 to 40).map(i => ("a", i.toLong, 10.0 + (i % 5) * 0.1)) ++
    (1 to 40).map(i => ("b", 100L + i, 50.0 + (i % 5) * 0.5))

  private lazy val frozen = OutlierStream.freezeRobustStats(
    ref.toDF("g", "id", "v"), "g", "v")

  test("frozen scale flags planted outliers per batch; unseen groups " +
      "surface as unscored; stream ≡ batch; replay no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    assert(frozen.count() == 2)
    val dir = java.nio.file.Files.createTempDirectory("outlierstream")
    val store = dir.resolve("flags").toString
    val b1 = Seq(("a", 1001L, 10.2), ("a", 1002L, 99.0), ("b", 1003L, 50.5))
    val b2 = Seq(("b", 2001L, -40.0), ("c", 2002L, 7.0)) // c unseen
    val stream = MemoryStream[(String, Long, Double)]
    val q = OutlierStream.outlierIngestStream(
        stream.toDF.toDF("g", "id", "v"), frozen, "g", "id", "v", store)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()

    val flagged = OutlierStream.flaggedHistory(spark, store).collect()
    assert(flagged.map(_.getLong(1)).toSet == Set(1002L, 2001L))

    val summary = OutlierStream.summaryHistory(spark, store).collect()
    // batch 1: group c has no frozen scale → scored = false
    val cRow = summary.find(r => r.getString(0) == "c").get
    assert(!cRow.getBoolean(3) && cRow.getLong(1) == 1L)
    val aRow = summary.find(r =>
      r.getString(0) == "a" && r.getLong(4) == 0L).get
    assert(aRow.getBoolean(3) && aRow.getLong(2) == 1L)

    // stream ≡ batch scoring
    val direct = OutlierStream.scoreBatch(b1.toDF("g", "id", "v"),
      frozen, "g", "id", "v").collect().map(_.getLong(1)).toSet
    assert(direct == Set(1002L))

    // replay: same lineage, applied batch id → identical store
    val lineage = {
      val src = scala.io.Source.fromFile(s"$store/_lineage")
      try src.mkString.trim finally src.close()
    }
    OutlierStream.applyOutlierBatch(b1.toDF("g", "id", "v"), 0L,
      frozen, "g", "id", "v", store, lineage = lineage)
    assert(OutlierStream.flaggedHistory(spark, store).count() ==
      flagged.length)
  }

  test("the frozen scale cannot be re-centered by a poisoning drift: " +
      "a batch of shifted values is ENTIRELY flagged (the rolling-" +
      "stats alternative would flag none of it)") {
    val poisoned = (1 to 20).map(i => ("a", 3000L + i, 99.0 + i * 0.01))
    val out = OutlierStream.scoreBatch(poisoned.toDF("g", "id", "v"),
      frozen, "g", "id", "v").collect()
    assert(out.length == 20)
  }
}
