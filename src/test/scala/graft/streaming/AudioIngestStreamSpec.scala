package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Audio feature extraction at ingest: streamed clips land as
  * per-frame features in a fenced batch-file store — stream ≡ batch,
  * replay a no-op, key-level delete composes (incl. the
  * delete-before-arrival gap).
  */
class AudioIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 22050

  private def tone(freq: Double, sec: Double): Array[Byte] = {
    val n = (sec * Sr).toInt
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = 0.5 * math.sin(2.0 * math.Pi * freq * i / Sr)
      val s16 = (v * 32767.0).toInt.toShort
      out(2 * i) = (s16 & 0xff).toByte
      out(2 * i + 1) = ((s16 >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def clip(id: Long, freq: Double) = (id, 0.0, tone(freq, 0.3), Sr)

  test("streamed clips featurize exactly once: stream ≡ batch, " +
      "replay no-op, deletes compose") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("audioingest")
    try {
      val store = dir.resolve("store").toString
      val cols = Seq("clip_id", "start_sec", "pcm", "sample_rate")
      val batch1 = Seq(clip(1L, 440.0), clip(2L, 880.0))
      val batch2 = Seq(clip(3L, 1320.0))
      val stream = MemoryStream[(Long, Double, Array[Byte], Int)]
      val q = StreamingOps.audioFeatureIngestStream(
          stream.toDF.toDF(cols: _*), store)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      q.stop()

      // stream ≡ batch: the store holds exactly the features the batch
      // path computes over the union of the clips
      val stored = StreamingOps.audioFeaturesFromStore(spark, store)
      val direct = graft.audio.SpectralFeatures.withFeatures(
          graft.audio.SpectralFeatures.frameSpectra(
            (batch1 ++ batch2).toDF(cols: _*), nFft = 512, hop = 256,
            idCol = "clip_id"),
          nFft = 512).drop("ps")
      assert(stored.count() === direct.count())
      assert(stored.exceptAll(direct).count() === 0 &&
        direct.exceptAll(stored).count() === 0,
        "streamed features must equal the batch path bit-for-bit")

      // replay the last batch as recovery re-delivers it
      val lineage = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(store, "_lineage")),
        java.nio.charset.StandardCharsets.UTF_8).trim
      StreamingOps.applyAudioFeatureBatch(batch2.toDF(cols: _*),
        batchId = 1L, store, nFft = 512, hop = 256,
        lineage = lineage)
      assert(StreamingOps.audioFeaturesFromStore(spark, store).count()
        === direct.count(), "replay must not grow the store")

      // key-level delete: clip 2's frames vanish from reads; compact
      // removes them physically and the reader still serves
      StreamingOps.deleteFromFeatureStore(Seq(2L).toDF("clip_id"),
        store, batchId = 0L)
      val afterDel = StreamingOps.audioFeaturesFromStore(spark, store)
      assert(afterDel.filter($"clip_id" === 2L).count() === 0)
      assert(afterDel.count() ===
        direct.filter($"clip_id" =!= 2L).count())
      StreamingOps.compactFeatureStore(spark, store)
      assert(spark.read.parquet(store).filter($"clip_id" === 2L)
        .count() === 0, "compact removes deleted frames physically")

      // delete-before-arrival: tombstone clip 9 before its audio lands
      StreamingOps.deleteFromFeatureStore(Seq(9L).toDF("clip_id"),
        store, batchId = 1L)
      StreamingOps.applyAudioFeatureBatch(
        Seq(clip(9L, 440.0), clip(10L, 440.0)).toDF(cols: _*),
        batchId = 7L, store, nFft = 512, hop = 256, lineage = lineage)
      val tail = StreamingOps.audioFeaturesFromStore(spark, store)
      assert(tail.filter($"clip_id" === 9L).count() === 0,
        "a pre-deleted clip must never be featurized into the store")
      assert(tail.filter($"clip_id" === 10L).count() > 0,
        "its batch-mates are unaffected")

      // empty-store bootstrap keeps the feature schema readable
      val empty = StreamingOps.audioFeaturesFromStore(spark,
        dir.resolve("nonexistent").toString)
      assert(empty.count() === 0)
      assert(empty.columns.toSet === tail.columns.toSet)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
