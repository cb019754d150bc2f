package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalStubsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val images = Seq(
    (1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4, 5, 6))
  ).toDF("image_id", "content")

  test("image features: schema, determinism, bounded channels") {
    val f1 = MultimodalStubs.imageFeatures(images).orderBy("image_id").collect()
    val f2 = MultimodalStubs.imageFeatures(images).orderBy("image_id").collect()
    assert(f1.sameElements(f2), "stub decode must be deterministic")
    assert(f1.length == 2)
    f1.foreach { r =>
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      assert(r.getAs[Int]("width") == 64)
    }
    // different content → different features
    assert(f1(0).getAs[Double]("mean_r") != f1(1).getAs[Double]("mean_r"))
  }

  test("video frame sampling: one row per sampled frame, time axis correct") {
    val videos = Seq((7L, Array[Byte](9, 9), 5.5)).toDF(
      "video_id", "content", "duration_sec")
    val frames = MultimodalStubs.sampleFrames(videos, fps = 2.0)
      .orderBy("frame_idx").collect()
    assert(frames.length == 11) // floor(5.5 * 2)
    assert(frames.head.getAs[Double]("frame_ts_sec") == 0.0)
    assert(frames.last.getAs[Double]("frame_ts_sec") == 5.0)
  }
}
