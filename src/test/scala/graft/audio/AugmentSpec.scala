package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Waveform augmentation: speed perturbation (duration and pitch
  * scaling verified via the spectral centroid — cross-operator),
  * RMS normalization, deterministic time shift. */
class AugmentSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 22050

  private def tonePcm(freq: Double, sec: Double, amp: Double = 0.3)
      : Array[Byte] = {
    val n = (sec * Sr).toInt
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (amp * math.sin(2.0 * math.Pi * freq * i / Sr) * 32767.0)
        .toInt.toShort
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def clips = Seq((1L, 0.0, tonePcm(1000.0, 0.5), Sr))
    .toDF("phrase_id", "start_sec", "pcm", "sample_rate")

  test("speed perturbation: duration scales by 1/α, pitch by α, " +
      "α = 1 is bit-exact") {
    val out = Augment.speedPerturb(clips).cache()
    assert(out.count() === 3)
    val n0 = (0.5 * Sr).toInt
    val asMap = out.collect()
      .map(r => r.getAs[Double]("speed") ->
        (r.getAs[Long]("n_samples"), r.getAs[Array[Byte]]("pcm"))).toMap
    assert(asMap(1.0)._2.sameElements(tonePcm(1000.0, 0.5)),
      "α = 1 must be a bit-exact passthrough")
    Seq(0.9, 1.1).foreach { a =>
      val expect = math.ceil(n0.toLong * math.round(Sr / a) / Sr.toDouble)
      assert(math.abs(asMap(a)._1 - expect) <= 1,
        s"α=$a duration: got ${asMap(a)._1}, expect ~$expect")
    }
    // pitch: the centroid of the α-perturbed 1 kHz tone sits at α·1 kHz
    Seq(0.9, 1.0, 1.1).foreach { a =>
      val one = out.filter($"speed" === a)
        .select($"phrase_id", $"start_sec", $"pcm", $"sample_rate")
      val c = SpectralFeatures.withFeatures(
          SpectralFeatures.frameSpectra(one))
        .agg(avg("centroid")).head().getDouble(0)
      assert(math.abs(c - 1000.0 * a) < 60.0,
        s"α=$a centroid $c, want ~${1000.0 * a}")
    }
    out.unpersist()
  }

  test("rms normalize: output rms hits the target; gain is the " +
      "measured ratio; silence passes through") {
    val mixed = Seq(
      (1L, tonePcm(500.0, 0.3, amp = 0.6)),
      (2L, tonePcm(500.0, 0.3, amp = 0.05)),
      (3L, new Array[Byte](1000)) // silence
    ).toDF("phrase_id", "pcm")
    val out = Augment.rmsNormalize(mixed, targetRms = 0.1).cache()
    val rmsAfter = udf { pcm: Array[Byte] =>
      val x = Dsp.pcm16ToDoubles(pcm)
      math.sqrt(x.map(v => v * v).sum / x.length)
    }
    val after = out.select($"phrase_id", rmsAfter($"pcm").as("r"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(after(1L) - 0.1) < 0.002, s"loud clip -> ${after(1L)}")
    assert(math.abs(after(2L) - 0.1) < 0.002, s"quiet clip -> ${after(2L)}")
    assert(after(3L) === 0.0, "silence stays silent (gain 1)")
    val gains = out.select($"phrase_id", $"gain", $"rms")
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // a 0.6-amplitude sine has rms 0.6/√2 ≈ 0.424 — gain ≈ 0.236
    assert(math.abs(gains(1L)._2 - 0.6 / math.sqrt(2.0)) < 0.01)
    assert(math.abs(gains(1L)._1 - 0.1 / gains(1L)._2) < 1e-12,
      "gain is exactly target/rms")
    assert(gains(3L)._1 === 1.0)
    out.unpersist()
  }

  test("mix at snr: achieved SNR hits the target; noise loops; " +
      "silence passes through bit-exactly; seed-deterministic") {
    val toMix = Seq(
      (1L, tonePcm(500.0, 0.5, amp = 0.5), Sr), // longer than the noise
      (2L, tonePcm(900.0, 0.2, amp = 0.1), Sr),
      (3L, new Array[Byte]((0.2 * Sr).toInt * 2), Sr) // silence
    ).toDF("phrase_id", "pcm", "sample_rate")
    val noise = Augment.syntheticNoise(spark, 3, 0.3, Sr)
    val out = Augment.mixAtSnr(toMix, noise, snrDb = 10.0, seed = 7L)
      .cache()
    val orig = toMix.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val rows = out.collect().map(r => r.getAs[Long]("phrase_id") -> r)
      .toMap
    // achieved SNR: rms(x)² / rms(mix − x)² ≈ 10^(10/10) = 10
    // (quantization adds ±1 LSB noise — loose 0.5 dB tolerance)
    Seq(1L, 2L).foreach { id =>
      val x = Dsp.pcm16ToDoubles(orig(id))
      val m = Dsp.pcm16ToDoubles(rows(id).getAs[Array[Byte]]("pcm"))
      assert(m.length === x.length, "length preserved (noise looped)")
      val px = x.map(v => v * v).sum / x.length
      val pn = x.indices.map(i => (m(i) - x(i)) * (m(i) - x(i))).sum /
        x.length
      val snr = 10.0 * math.log10(px / pn)
      assert(math.abs(snr - 10.0) < 0.5, s"clip $id achieved $snr dB")
    }
    // silent clip: gain 0·noise? no — silent SIGNAL means zero target
    // power, so g = 0 and the mixture is the clip itself, bit-exact
    assert(rows(3L).getAs[Double]("gain") === 0.0)
    assert(java.util.Arrays.equals(
      rows(3L).getAs[Array[Byte]]("pcm"), orig(3L)))
    // determinism + pick range
    val again = Augment.mixAtSnr(toMix, noise, snrDb = 10.0, seed = 7L)
    assert(out.select("phrase_id", "noise_id", "gain")
      .exceptAll(again.select("phrase_id", "noise_id", "gain"))
      .count() === 0)
    assert(out.filter($"noise_id" < 0 || $"noise_id" >= 3).count() === 0)
    out.unpersist()
  }

  test("time shift: seeded, length-preserving, content moved intact") {
    val many = (1L to 8L).map(i => (i, tonePcm(300.0 + 100 * i, 0.2), Sr))
      .toDF("phrase_id", "pcm", "sample_rate")
    val a = Augment.timeShift(many, seed = 5L).cache()
    val b = Augment.timeShift(many, seed = 5L)
    val c = Augment.timeShift(many, seed = 6L)
    val shiftsA = a.select("phrase_id", "shift_samples")
      .as[(Long, Int)].collect().toMap
    assert(b.select("phrase_id", "shift_samples").as[(Long, Int)]
      .collect().toMap === shiftsA, "same seed, same shifts")
    assert(c.select("phrase_id", "shift_samples").as[(Long, Int)]
      .collect().toMap !== shiftsA, "different seed, different shifts")
    val sr = Sr
    val orig = many.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    a.collect().foreach { r =>
      val id = r.getAs[Long]("phrase_id")
      val pcm = r.getAs[Array[Byte]]("pcm")
      val sh = shiftsA(id) * 2
      assert(pcm.length === orig(id).length, "length preserved")
      assert(sh >= 0 && sh < (0.1 * sr).toInt * 2, "shift in range")
      assert(pcm.take(sh).forall(_ == 0), "leading pad is silence")
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(pcm, sh, pcm.length),
        java.util.Arrays.copyOfRange(orig(id), 0,
          orig(id).length - sh)), "content moved intact")
    }
    a.unpersist()
  }
}
