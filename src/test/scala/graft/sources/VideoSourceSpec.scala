package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pins for the real MJPEG-in-AVI path: container round-trip
  * through the sink/scan, frame counts and container-carried timestamps,
  * decoded-feature determinism, corrupt-input verdicts, and frame
  * sampling.
  */
class VideoSourceSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("avi container round-trip: parse recovers fps and exact frame bytes") {
    val frames = (0 until 5).map(f => VideoSource.jpegFrame(7L, 33, 24, f))
    // odd-length JPEG payloads exercise the even-padding rule
    val avi = VideoSource.aviBytes(frames, fps = 4, w = 33, h = 24)
    val Some((scale, rate, back)) = VideoSource.parseAvi(avi)
    assert(scale == 1 && rate == 4)
    assert(back.length == 5)
    frames.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes must round-trip")
    }
    // every frame payload is a real JPEG the JDK can decode
    back.foreach { p =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img != null && img.getWidth == 33 && img.getHeight == 24)
    }
  }

  test("avi sink + scan round-trip with hostile directory entries") {
    val dir = java.nio.file.Files.createTempDirectory("avi").toString
    val vids = VideoSource.generateVideos(spark, sfDir).limit(4).cache()
    VideoSource.writeAviFiles(vids, "video_id", "content", dir)
    java.nio.file.Files.write( // non-numeric basename: skipped
      java.nio.file.Paths.get(dir, "backup.avi"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write( // trailing digit: must not alias id 2
      java.nio.file.Paths.get(dir, "backup2.avi"), Array[Byte](4, 5, 6))
    java.nio.file.Files.write( // numeric but corrupt: verdict row
      java.nio.file.Paths.get(dir, "999.avi"), Array[Byte](82, 73, 70))
    val back = VideoSource.readAviFiles(spark, dir).cache()
    assert(back.count() == 5) // 4 real + corrupt 999
    assert(back.filter(!col("decoded")).select("video_id")
      .as[Long].collect().toSeq == Seq(999L))
    val expected = vids.select("video_id", "content")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> VideoSource.parseAvi(b).get._3.length }
      .toMap
    back.filter(col("decoded")).select("video_id", "n_frames", "fps")
      .as[(Long, Int, Double)].collect().foreach { case (id, n, fps) =>
        assert(n == expected(id), s"video $id frame count")
        assert(fps == 4.0, s"video $id header fps")
      }
  }

  test("crafted hostile containers yield verdicts, not Errors") {
    def riffHeader(): java.io.ByteArrayOutputStream = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("RIFF".getBytes("US-ASCII"))
      b.write(Array[Byte](0, 0, 0, 0)) // size (ignored)
      b.write("AVI ".getBytes("US-ASCII"))
      b
    }
    def le32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
      b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
    }
    // (a) declared chunk size near Int.MaxValue: position + sz overflows
    // Int — must be caught by the long-arithmetic bounds check, not
    // bypass it and attempt a ~2 GB allocation (OutOfMemoryError is an
    // Error and would escape the Exception catch, killing the task)
    val overflow = riffHeader()
    overflow.write("00dc".getBytes("US-ASCII"))
    le32(overflow, 0x7fffffd0L)
    assert(VideoSource.parseAvi(overflow.toByteArray).isEmpty)
    // (b) pathological LIST nesting with mutually-consistent sizes (so
    // every level passes the bounds check and actually recurses): would
    // StackOverflowError (an Error) without the depth cap
    val n = 100000
    val nested = riffHeader()
    (0 until n).foreach { i =>
      nested.write("LIST".getBytes("US-ASCII"))
      le32(nested, 4 + 12L * (n - 1 - i)) // fourcc + remaining nest
      nested.write("movi".getBytes("US-ASCII"))
    }
    assert(VideoSource.parseAvi(nested.toByteArray).isEmpty)
  }

  test("foreign muxer tolerance: rec-grouped frames, multi-stream chunk pairing") {
    // hand-muxed AVI shaped like interleaved foreign output: stream 0 is
    // audio ('auds', emits 00wb chunks), stream 1 is the video ('vids',
    // scale=1 rate=5, emits 01dc chunks), and one frame rides inside a
    // LIST('rec ') grouping as the spec allows
    def le32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
      b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
    }
    def cc(b: java.io.ByteArrayOutputStream, s: String): Unit =
      b.write(s.getBytes("US-ASCII"))
    def chunk(b: java.io.ByteArrayOutputStream, id: String,
        p: Array[Byte]): Unit = {
      cc(b, id); le32(b, p.length); b.write(p)
      if ((p.length & 1) == 1) b.write(0)
    }
    def strh(fccType: String, scale: Int, rate: Int): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      cc(b, fccType); b.write(new Array[Byte](16)) // handler..initialFrames
      le32(b, scale); le32(b, rate)
      b.toByteArray
    }
    def list(lt: String, body: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      cc(b, "LIST"); le32(b, 4L + body.length); cc(b, lt); b.write(body)
      b.toByteArray
    }
    val jpeg1 = VideoSource.jpegFrame(3L, 32, 24, 0)
    val jpeg2 = VideoSource.jpegFrame(3L, 32, 24, 1)
    val audio = Array.fill[Byte](10)(0x55)
    val strl0 = new java.io.ByteArrayOutputStream()
    chunk(strl0, "strh", strh("auds", 1, 16000))
    val strl1 = new java.io.ByteArrayOutputStream()
    chunk(strl1, "strh", strh("vids", 1, 5))
    val hdrl = new java.io.ByteArrayOutputStream()
    hdrl.write(list("strl", strl0.toByteArray))
    hdrl.write(list("strl", strl1.toByteArray))
    val rec = new java.io.ByteArrayOutputStream()
    chunk(rec, "01dc", jpeg1); chunk(rec, "00wb", audio)
    val movi = new java.io.ByteArrayOutputStream()
    chunk(movi, "00wb", audio)
    movi.write(list("rec ", rec.toByteArray))
    chunk(movi, "01dc", jpeg2)
    val file = new java.io.ByteArrayOutputStream()
    cc(file, "RIFF"); le32(file, 0); cc(file, "AVI ")
    file.write(list("hdrl", hdrl.toByteArray))
    file.write(list("movi", movi.toByteArray))
    val Some((scale, rate, frames)) = VideoSource.parseAvi(file.toByteArray)
    // rate/scale come from the vids stream, not the audio stream
    assert(scale == 1 && rate == 5)
    // exactly the two video frames: the audio chunks (both at top level
    // and inside 'rec ') are excluded, the rec-grouped frame is found,
    // and frame order is preserved
    assert(frames.length == 2)
    assert(java.util.Arrays.equals(frames(0), jpeg1))
    assert(java.util.Arrays.equals(frames(1), jpeg2))
  }

  test("valid zero-frame avi keeps its row in both scan and feature passes") {
    val avi = VideoSource.aviBytes(Seq.empty, fps = 4, w = 32, h = 24)
    assert(VideoSource.parseAvi(avi).map(_._3.length).contains(0))
    val df = Seq((7L, avi)).toDF("video_id", "content")
    val feats = VideoSource.sampleFrameFeatures(df)
    // exactly one decoded=true row with null frame columns — the video
    // must not silently vanish from per-video joins downstream
    assert(feats.count() == 1)
    assert(feats.filter(col("decoded") && col("frame_idx").isNull)
      .count() == 1)
  }

  test("frame features: count, container timestamps, determinism, sampling") {
    val vids = VideoSource.generateVideos(spark, sfDir).limit(6).cache()
    val feats = VideoSource.sampleFrameFeatures(vids).cache()
    // frame count per video matches the container's chunk count
    val expected = vids.as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> VideoSource.parseAvi(b).get._3.length }
      .toMap
    val counts = feats.groupBy("video_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts == expected.map { case (k, v) => k -> v.toLong })
    // timestamps come from the stream header: idx * scale/rate at fps 4
    feats.select("frame_idx", "frame_ts_sec").as[(Long, Double)].collect()
      .foreach { case (f, ts) => assert(ts == f / 4.0, s"frame $f ts") }
    // all decoded, real dimensions, luma in (0,1) — a content-hash fake
    // can't produce these from actual pixel sums
    assert(feats.filter(!col("decoded")).isEmpty)
    feats.select("width", "height", "mean_luma").as[(Int, Int, Double)]
      .collect().foreach { case (w, h, l) =>
        assert(w >= 32 && h >= 24 && l > 0.0 && l < 1.0)
      }
    // byte-identical across runs (seeded render, deterministic codecs)
    val again = VideoSource.sampleFrameFeatures(vids)
    assert(feats.exceptAll(again).union(again.exceptAll(feats)).isEmpty)
    // every=2 keeps exactly the even frame indices
    val sampled = VideoSource.sampleFrameFeatures(vids, every = 2)
    val sampledIdx = sampled.select("video_id", "frame_idx")
      .as[(Long, Long)].collect().toSet
    val fullIdx = feats.select("video_id", "frame_idx")
      .as[(Long, Long)].collect().toSet
    assert(sampledIdx == fullIdx.filter(_._2 % 2 == 0))
    // corrupt container → single verdict row with null frame columns
    val mixed = vids.limit(1).select(col("video_id"), col("content"))
      .unionByName(Seq((888L, Array[Byte](0, 1, 2)))
        .toDF("video_id", "content"))
    val verdict = VideoSource.sampleFrameFeatures(mixed)
      .filter(col("video_id") === 888L)
    assert(verdict.count() == 1)
    assert(verdict.filter(!col("decoded") && col("frame_idx").isNull)
      .count() == 1)
  }
}
