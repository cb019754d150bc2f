package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PSI against a frozen reference: stream ≡ batch scoring,
  * drifted batch alarms, replay no-op, lineage fence. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def u(seed: Int, n: Int): Seq[Double] =
    (1 to n).map(i => ((i.toLong * 2654435761L + seed) % 10007) / 10007.0)

  private lazy val frozen = DriftStream.freezeReference(
    u(1, 4000).toDF("value"), "value")

  test("frozen reference captures the window; streamed batches score " +
      "exactly like the batch path; a drifted batch alarms") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    assert(frozen.refTot == 4000L && frozen.binCounts.sum == 4000L)
    val dir = java.nio.file.Files.createTempDirectory("driftstream")
    val store = dir.resolve("psi").toString
    val clean = u(7, 1000)
    val drifted = u(8, 1000).map(_ + 0.5)
    val stream = MemoryStream[Double]
    val q = DriftStream.psiIngestStream(
        stream.toDF.toDF("value"), "value", frozen, store)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    stream.addData(clean); q.processAllAvailable()
    stream.addData(drifted); q.processAllAvailable()
    q.stop()

    val hist = DriftStream.psiHistory(spark, store)
    val psiByBatch = hist.groupBy("batch_id")
      .agg(sum("psi_term").as("psi")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(psiByBatch(0L) < 0.05, s"clean batch PSI ${psiByBatch(0L)}")
    assert(psiByBatch(1L) > 0.25, s"drifted batch PSI ${psiByBatch(1L)}")

    // stream ≡ batch: stored rows for batch 0 equal scoreBatch's
    val stored0 = hist.filter(col("batch_id") === 0L)
      .drop("batch_id").collect().map(_.toSeq).toSeq
    val direct = DriftStream.scoreBatch(clean.toDF("value"), "value",
      frozen).collect().map(_.toSeq).toSeq
    assert(stored0 == direct)

    // replay an applied batch id under the same lineage: no-op
    val lineage = {
      val src = scala.io.Source.fromFile(s"$store/_lineage")
      try src.mkString.trim finally src.close()
    }
    DriftStream.applyPsiBatch(clean.toDF("value"), 0L, "value", frozen,
      store, lineage)
    assert(DriftStream.psiHistory(spark, store).count() == hist.count())

    // a different lineage is fenced off
    val e = intercept[IllegalStateException] {
      DriftStream.applyPsiBatch(clean.toDF("value"), 2L, "value",
        frozen, store, "other-query")
    }
    assert(e.getMessage.contains("lineage"))
  }

  test("empty reference refuses to freeze; empty batch scores finite " +
      "maximal drift") {
    intercept[IllegalArgumentException] {
      DriftStream.freezeReference(Seq.empty[Double].toDF("value"),
        "value")
    }
    val out = DriftStream.scoreBatch(Seq.empty[Double].toDF("value"),
      "value", frozen).collect()
    assert(out.length == 10)
    assert(out.forall(r => !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinite))
  }
}
