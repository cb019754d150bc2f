package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** The resampler's DSP contract: constants pass through exactly
  * (per-phase gain normalization), in-band tones survive rate changes
  * with their frequency and amplitude, out-of-band energy is
  * suppressed on downsample (the anti-aliasing a linear interpolator
  * lacks), lengths follow the ceil convention, and the PCM16 byte path
  * round-trips.
  */
class SrcSpec extends AnyFunSuite {

  private def tone(freq: Double, sr: Int, nSec: Double,
      amp: Double = 0.5): Array[Double] =
    Array.tabulate((sr * nSec).toInt)(i =>
      amp * math.sin(2.0 * math.Pi * freq * i / sr))

  private def rms(x: Array[Double]): Double =
    math.sqrt(x.map(v => v * v).sum / math.max(1, x.length))

  /** Dominant frequency via the repo's own radix-2 FFT. */
  private def dominantHz(x: Array[Double], sr: Int): Double = {
    val n = Integer.highestOneBit(x.length)
    val re = x.take(n).toArray
    val im = new Array[Double](n)
    Dsp.fft(re, im)
    val mags = Array.tabulate(n / 2)(k =>
      math.hypot(re(k), im(k)))
    val k = mags.indexOf(mags.max)
    k.toDouble * sr / n
  }

  test("identity when rates match; empty input stays empty") {
    val x = tone(440, 22050, 0.1)
    assert(Src.resample(x, 22050, 22050).toSeq === x.toSeq)
    assert(Src.resample(Array.empty[Double], 22050, 16000).isEmpty)
  }

  test("output length follows the ceil convention") {
    for ((n, si, so) <- Seq((22050, 22050, 16000), (1000, 44100, 22050),
        (3, 8000, 44100), (22051, 22050, 16000))) {
      val out = Src.resample(new Array[Double](n), si, so)
      assert(out.length === ((n.toLong * so + si - 1) / si).toInt,
        s"n=$n $si->$so")
    }
  }

  test("a constant signal resamples to the same constant exactly") {
    val x = Array.fill(2000)(0.37)
    for (so <- Seq(16000, 44100, 8000)) {
      val y = Src.resample(x, 22050, so)
      assert(y.forall(v => math.abs(v - 0.37) < 1e-12),
        s"DC not preserved at $so: ${y.take(5).toSeq}")
    }
  }

  test("an in-band tone keeps its frequency and amplitude") {
    for ((si, so) <- Seq((22050, 16000), (16000, 44100))) {
      val y = Src.resample(tone(440, si, 1.0), si, so)
      val f = dominantHz(y, so)
      assert(math.abs(f - 440.0) < 440.0 * 0.02,
        s"$si->$so: dominant $f, expected 440")
      // interior RMS (skip filter warm-up edges)
      val core = y.slice(so / 10, y.length - so / 10)
      assert(math.abs(rms(core) - 0.5 / math.sqrt(2)) < 0.01,
        s"$si->$so: tone amplitude drifted (rms ${rms(core)})")
    }
  }

  test("downsampling suppresses out-of-band energy (anti-aliasing)") {
    // 10 kHz tone is above 16 kHz's 8 kHz Nyquist: a bandlimited
    // resampler must remove it, a linear interpolator aliases it to
    // 6 kHz at near-full amplitude
    val y = Src.resample(tone(10000, 44100, 1.0), 44100, 16000)
    val core = y.slice(1600, y.length - 1600)
    assert(rms(core) < 0.02,
      s"aliased energy leaked through: rms ${rms(core)}")
  }

  test("in-band content is untouched while out-of-band is removed") {
    // 440 Hz + 10 kHz mix, 44.1k -> 16k: output ≈ the 440 Hz part alone
    val a = tone(440, 44100, 1.0)
    val b = tone(10000, 44100, 1.0)
    val mix = a.zip(b).map { case (u, v) => u + v }
    val y = Src.resample(mix, 44100, 16000)
    val ref = Src.resample(a, 44100, 16000)
    val diff = y.zip(ref).map { case (u, v) => u - v }
    assert(rms(diff.slice(1600, diff.length - 1600)) < 0.02,
      "mix minus clean-tone resample should be near silence")
  }

  test("upsample then downsample is near-identity") {
    val x = tone(440, 22050, 0.5, amp = 0.4)
    val back = Src.resample(Src.resample(x, 22050, 44100), 44100, 22050)
    val n = math.min(x.length, back.length)
    val core = (2205 until n - 2205).map(i => back(i) - x(i))
    assert(math.sqrt(core.map(v => v * v).sum / core.length) < 0.005,
      "round trip drifted")
  }

  test("ingest chain composes: 44.1k corpus -> resample -> mel pipeline") {
    // the librosa.load story end-to-end: a "field recording" arrives at
    // 44.1 kHz, the ingest resamples it to the pipeline's 22.05 kHz,
    // and the mel features must match the natively-22.05k original
    val spark = graft.TestSession.spark
    import org.apache.spark.sql.functions._
    val clips = graft.gen.VoiceDataGen.generate(spark, 3, 42L)
      .select("phrase_id", "pcm", "sample_rate")
    val up = udf((pcm: Array[Byte]) => Src.resamplePcm16(pcm, 22050, 44100))
    val down = udf((pcm: Array[Byte]) => Src.resamplePcm16(pcm, 44100, 22050))
    val fieldRecordings = clips
      .select(col("phrase_id"), down(up(col("pcm"))).as("pcm"),
        col("sample_rate"))
    val f0 = new MelSpectrogram().transform(
        clips.withColumn("start_sec", lit(0.0)))
      .select(col("phrase_id"), col("frame_id"), col("mel"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getSeq[Double](2)).toMap
    val f1 = new MelSpectrogram().transform(
        fieldRecordings.withColumn("start_sec", lit(0.0)))
      .select(col("phrase_id"), col("frame_id"), col("mel"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getSeq[Double](2)).toMap
    assert(f0.nonEmpty && f0.keySet === f1.keySet,
      "round-tripped corpus must frame identically")
    // compare on the dB-like log scale (mel power spans decades)
    val errs = f0.keys.toSeq.flatMap { k =>
      f0(k).zip(f1(k)).map { case (u, v) =>
        math.abs(math.log10(u + 1e-10) - math.log10(v + 1e-10)) }
    }
    val meanErr = errs.sum / errs.length
    assert(meanErr < 0.05,
      s"mel features drifted through the 44.1k ingest chain: $meanErr")
  }

  test("PCM16 byte path round-trips through the resampler") {
    val x = tone(440, 22050, 0.2)
    val pcm = x.map(v => math.rint(v * 32767.0).toInt).flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    val out = Src.resamplePcm16(pcm, 22050, 16000)
    assert(out.length % 2 === 0)
    val y = Dsp.pcm16ToDoubles(out)
    assert(y.length === ((x.length.toLong * 16000 + 22049) / 22050).toInt)
    assert(math.abs(dominantHz(y, 16000) - 440.0) < 10.0)
  }
}
