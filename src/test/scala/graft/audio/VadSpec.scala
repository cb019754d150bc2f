package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-layout properties for energy VAD: planted silence gaps come
  * back as exactly the planted segments. */
class VadSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 22050
  private val NFft = 512
  private val Hop = 256

  private def pcm(samples: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s16 = math.max(-32767,
        math.min(32767, (samples(i) * 32767.0).toInt)).toShort
      out(2 * i) = (s16 & 0xff).toByte
      out(2 * i + 1) = ((s16 >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def tone(freq: Double, sec: Double): Array[Double] =
    Array.tabulate((sec * Sr).toInt)(i =>
      0.6 * math.sin(2.0 * math.Pi * freq * i / Sr))

  private def silence(sec: Double): Array[Double] =
    new Array[Double]((sec * Sr).toInt)

  test("two planted tone bursts come back as two segments at the " +
      "planted frame ranges") {
    val y = silence(0.3) ++ tone(1000, 0.5) ++ silence(0.4) ++
      tone(800, 0.3) ++ silence(0.2)
    val clips = Seq((1L, 0.0, pcm(y), Sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val segs = Vad.segments(
        SpectralFeatures.frameSpectra(clips, NFft, Hop), NFft, Hop,
        topDb = 30.0)
      .orderBy("seg_id").collect()
    assert(segs.length === 2, s"expected 2 segments, got ${segs.toSeq}")
    // expected voiced frame ranges from the planted sample layout
    // (tone 1: samples [6615, 17640); tone 2: [26460, 33075)); edge
    // frames holding only a few near-zero-phase tone samples may fall
    // either side of the threshold — allow ±2 frames
    def frameRange(lo: Int, hi: Int) =
      (math.ceil((lo - NFft + 1).toDouble / Hop).toInt.max(0),
        (hi - 1) / Hop)
    val (e1lo, e1hi) = frameRange(6615, 17640)
    val (e2lo, e2hi) = frameRange(26460, 33075)
    def near(a: Long, b: Int) = math.abs(a - b) <= 2
    assert(near(segs(0).getAs[Long]("start_frame"), e1lo) &&
      near(segs(0).getAs[Long]("end_frame"), e1hi), s"seg0 ${segs(0)}")
    assert(near(segs(1).getAs[Long]("start_frame"), e2lo) &&
      near(segs(1).getAs[Long]("end_frame"), e2hi), s"seg1 ${segs(1)}")
    // contiguity + sample-bound arithmetic
    segs.foreach { r =>
      assert(r.getAs[Long]("n_frames") ===
        r.getAs[Long]("end_frame") - r.getAs[Long]("start_frame") + 1)
      assert(r.getAs[Long]("start_sample") ===
        r.getAs[Long]("start_frame") * Hop)
      assert(r.getAs[Long]("end_sample") ===
        r.getAs[Long]("end_frame") * Hop + NFft)
    }
  }

  test("all-silent clip yields no segments; pure tone yields one " +
      "segment covering every frame") {
    val clips = Seq(
      (1L, 0.0, pcm(silence(0.5)), Sr),
      (2L, 0.0, pcm(tone(1000, 0.5)), Sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val frames = SpectralFeatures.frameSpectra(clips, NFft, Hop)
    val segs = Vad.segments(frames, NFft, Hop, topDb = 30.0)
    assert(segs.filter($"phrase_id" === 1L).count() === 0)
    val t = segs.filter($"phrase_id" === 2L).collect()
    val nf = frames.filter($"phrase_id" === 2L).count()
    assert(t.length === 1)
    assert(t(0).getAs[Long]("start_frame") === 0L)
    assert(t(0).getAs[Long]("end_frame") === nf - 1)
    assert(t(0).getAs[Long]("n_frames") === nf)
  }

  test("topDb widens segments monotonically") {
    val y = silence(0.3) ++ tone(1000, 0.5) ++ silence(0.3)
    val clips = Seq((1L, 0.0, pcm(y), Sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val frames = SpectralFeatures.frameSpectra(clips, NFft, Hop)
    def voicedFrames(db: Double) =
      Vad.segments(frames, NFft, Hop, topDb = db)
        .agg(sum("n_frames")).as[Long].head()
    // a laxer (larger) topDb admits lower-energy frames: coverage can
    // only grow
    val strict = voicedFrames(20.0)
    val lax = voicedFrames(40.0)
    assert(strict <= lax, s"topDb=20 -> $strict frames, 40 -> $lax")
    assert(lax >= 40L, "the 0.5 s burst spans ~43 frames")
  }
}
