package graft.sources

import graft.SparkSpec

/** Cross-video frame reuse: the planted re-containered partial copies
  * are recovered exactly — every reused frame maps to its source frame
  * at hamming 0 through the real AVI demux + JPEG decode — and nothing
  * else surfaces (block-noise frames make incidental collisions
  * impossible, the image-corpus argument).
  */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted frame reuse recovered exactly: base frames 3..5 pair " +
      "with variant frames 0..2 at hamming 0, nothing else") {
    val pairs = VideoDedup.nqVideoNeardup(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val planted = graft.Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect()
      .filter(_ % 10 == 0)
      .flatMap(id => (0 until 3).map(f =>
        (id, (f + 3).toLong, id + 1000000L, f.toLong, 0L)))
      .toSet
    assert(pairs.toSet === planted,
      s"expected exactly the planted reuse pairs; diff = " +
        s"${pairs.toSet.diff(planted) ++ planted.diff(pairs.toSet)}")
  }

  test("frame-id packing overflows LOUDLY at 100 frames") {
    // the ·100 packing both entries and their oracles unpack would
    // silently alias a 100th frame into the next video's id space —
    // the guard must throw instead
    assert(VideoDedup.packFrameId(7L, 99) === 799L)
    val e = intercept[IllegalArgumentException] {
      VideoDedup.packFrameId(7L, 100)
    }
    assert(e.getMessage.contains("packing"))
  }

  test("frames survive the container round-trip: demux count and hash " +
      "determinism") {
    val vids = VideoDedup.generateDedupVideos(spark, sf0001)
    val n = graft.Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect()
    val expected = n.count(_ % 5 == 0) * 6 + n.count(_ % 10 == 0) * 6
    val hashes = ImageDedup.dhashes(
      vids.selectExpr("video_id", "content").as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoSource.parseAvi(avi).iterator.flatMap(_._3.zipWithIndex
            .map { case (j, f) => (id * 100L + f, j) })
        }).toDF("image_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size === expected, "every frame must demux and hash")
  }
}
