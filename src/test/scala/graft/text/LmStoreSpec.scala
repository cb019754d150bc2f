package graft.text

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** LM count store: stored model ≡ monolithic retrain, replay no-op,
  * streaming ingest, incremental refresh without corpus rescan. */
class LmStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val b1 = Seq((1L, "a b c d a b c"), (2L, "b c d e a b"))
  private val b2 = Seq((3L, "c d e a a b c"), (4L, "d e a b c b"))
  private val b3 = Seq((5L, "e a b c d e b"))

  test("the stored model is bit-identical to monolithic retraining " +
      "on everything ingested; a replayed batch is a byte no-op") {
    val dir = java.nio.file.Files.createTempDirectory("lmstore")
    val store = dir.resolve("counts").toString
    LmStore.applyBatch(docs(b1: _*), store, 0L)
    LmStore.applyBatch(docs(b2: _*), store, 1L)
    val mono = KneserNey.trigramLm(docs((b1 ++ b2): _*))
      .collect().toSeq
    assert(LmStore.lmFromStore(spark, store).collect().toSeq == mono)
    // replay batch 1: dynamic overwrite of its own partition — no-op
    LmStore.applyBatch(docs(b2: _*), store, 1L)
    assert(LmStore.lmFromStore(spark, store).collect().toSeq == mono)
    // incremental refresh: one more batch, old corpora never rescanned
    LmStore.applyBatch(docs(b3: _*), store, 2L)
    assert(LmStore.lmFromStore(spark, store).collect().toSeq ==
      KneserNey.trigramLm(docs((b1 ++ b2 ++ b3): _*)).collect().toSeq)
  }

  test("streaming ingest lands the same store as the batch loop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lmstream")
    val store = dir.resolve("counts").toString
    val stream = MemoryStream[(Long, String)]
    val q = LmStore.lmIngestStream(
        stream.toDF.toDF("doc_id", "text"), store)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(LmStore.lmFromStore(spark, store).collect().toSeq ==
      KneserNey.trigramLm(docs((b1 ++ b2): _*)).collect().toSeq)
  }
}
