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

  test("keyframe selection picks exactly the scene starts; re-timed " +
      "reused scenes are recovered at hamming 0 despite misaligned " +
      "frame offsets") {
    val vids = VideoDedup.generateSceneVideos(spark, sf0001)
    val ids = graft.Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect()
    // selection: base videos (4 scenes x 3 frames) keyframe at 0,3,6,9;
    // copies (2 reused scenes x 4 + 2 fresh x 3) at 0,4,8,11
    val kf = VideoDedup.keyframes(vids).select("image_id").as[Long]
      .collect().groupBy(_ / 100).view.mapValues(_.map(_ % 100).sorted)
    val someBase = ids.find(_ % 5 == 0).get
    assert(kf(someBase).toSeq === Seq(0L, 3L, 6L, 9L))
    val someCopy = ids.find(_ % 10 == 0).get + 1000000L
    assert(kf(someCopy).toSeq === Seq(0L, 4L, 8L, 11L))
    // the fused one-decode path is bit-identical to select-then-hash
    val fused = VideoDedup.keyframeHashes(vids).as[(Long, Long)]
      .collect().toMap
    val twoPass = ImageDedup.dhashes(VideoDedup.keyframes(vids))
      .as[(Long, Long)].collect().toMap
    assert(fused === twoPass)
    // recall: reused scenes 2 and 3 of each base start at base frames
    // 6 and 9 and at copy frames 0 and 4 — NO frame offset coincides
    // (the re-timing), yet content-based selection pairs them exactly
    val pairs = VideoDedup.nqVideoKeyframes(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val planted = ids.filter(_ % 10 == 0).flatMap { id =>
      Seq((id, 6L, id + 1000000L, 0L, 0L), (id, 9L, id + 1000000L, 4L, 0L))
    }.toSet
    assert(pairs.toSet === planted,
      s"diff = ${pairs.toSet.diff(planted) ++ planted.diff(pairs.toSet)}")
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
