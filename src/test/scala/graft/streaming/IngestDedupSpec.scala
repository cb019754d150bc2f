package graft.streaming

import graft.SparkSpec
import graft.text.NearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming ingest dedup: feeding the corpus through
  * micro-batches must (a) leave the signature store holding exactly one
  * signature row per shingleable doc, and (b) emit exactly the pairs
  * the full-corpus batch run finds — each pair once, when its
  * later-arriving member lands.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  test("ingest stream maintains the store and reproduces the full-run pairs") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    val storePath = dir.resolve("signatures").toString
    val pairsPath = dir.resolve("pairs").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = StreamingOps
        .ingestDedupStream(stream.toDF.toDF("doc_id", "text"),
          storePath, pairsPath)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()

      // store: exactly the batch-path signatures of the whole corpus —
      // ONE row per doc (collect to rows first; a toMap would silently
      // collapse duplicate doc_id rows before the comparison)
      val storeRows = spark.read.parquet(storePath)
        .select("doc_id", "sz").as[(Long, Int)].collect()
      assert(storeRows.length === storeRows.map(_._1).distinct.length,
        "store holds duplicate doc_id rows")
      val store = storeRows.toMap
      val full = NearDup
        .minhashNeardupFast(spark, sf0001) // ensures same defaults below
      val wantSigs = graft.Tables.documents(spark, sf0001)
        .select("doc_id", "text")
      val expected = {
        // one signature row per shingleable doc, sz matching
        val m = scala.collection.mutable.Map.empty[Long, Int]
        wantSigs.as[(Long, String)].collect().foreach { case (id, text) =>
          val n = text.split("\\s+").length
          if (n >= 3) m(id) = 0 // presence check; sz checked nonzero below
        }
        m
      }
      assert(store.keySet === expected.keySet,
        s"store docs ${store.size} vs expected ${expected.size}")
      assert(store.values.forall(_ > 0))

      // pairs: union over micro-batches equals the full-corpus run
      val got = spark.read.parquet(pairsPath)
        .select("d1", "d2", "jaccard").as[(Long, Long, Double)]
        .collect()
      val gotSet = got.toSet
      assert(got.length === gotSet.size, "a pair was emitted twice")
      val want = full.select("d1", "d2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(gotSet === want,
        s"missing=${want -- gotSet} extra=${gotSet -- want}")
      assert(want.nonEmpty)

      // redelivery/restart idempotence: replaying the ENTIRE corpus into
      // the same store (what an at-least-once source or a foreachBatch
      // re-run after restart does) must change nothing — the store
      // anti-join recognizes every doc as already ingested
      val replay = MemoryStream[(Long, String)]
      val q2 = StreamingOps
        .ingestDedupStream(replay.toDF.toDF("doc_id", "text"),
          storePath, pairsPath)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      replay.addData(docs.toIndexedSeq)
      q2.processAllAvailable()
      q2.stop()
      assert(spark.read.parquet(storePath).count() === storeRows.length.toLong,
        "replay duplicated store rows")
      assert(spark.read.parquet(pairsPath).count() === got.length.toLong,
        "replay re-emitted pairs")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
