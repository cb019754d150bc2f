package graft.streaming

import graft.SparkSpec
import graft.text.NearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup candidate detection: documents fed in several
  * micro-batches must surface every pair the batch MinHash path verifies
  * — including pairs whose two members arrive in DIFFERENT batches
  * (that's what the keyed bucket state buys).
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming candidates cover all batch-verified pairs across micro-batches") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val truePairs = NearDup.minhashNeardupFast(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(truePairs.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps
      .neardupCandidatesStream(stream.toDF.toDF("doc_id", "text"))
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_cands")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // three micro-batches: planted dup pairs land on both sides of the
    // batch boundaries (ids are interleaved by modulus, so most pairs
    // straddle batches)
    docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val cands = spark.table("neardup_cands")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val missed = truePairs -- cands
    assert(missed.isEmpty, s"streaming candidates missed: $missed")
    // sub-quadratic sanity: nowhere near all-pairs
    val n = docs.length.toLong
    assert(cands.size < n * (n - 1) / 4,
      s"${cands.size} candidates for $n docs is not sub-quadratic-ish")
  }
}
