package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Signal-theory goldens for the phase vocoder: stretch preserves
  * pitch while scaling duration; pitch shift preserves duration while
  * scaling pitch. */
class PhaseVocoderSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 22050

  private def tone(freq: Double, sec: Double): Array[Double] =
    Array.tabulate((sec * Sr).toInt)(i =>
      0.5 * math.sin(2.0 * math.Pi * freq * i / Sr))

  private def toPcm(x: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](x.length * 2)
    var i = 0
    while (i < x.length) {
      val s = math.max(-32767, math.min(32767, (x(i) * 32767.0).toInt))
        .toShort
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def centroidOf(df: org.apache.spark.sql.DataFrame): Double =
    SpectralFeatures.withFeatures(SpectralFeatures.frameSpectra(df))
      .agg(avg("centroid")).head().getDouble(0)

  test("stretch scales duration by 1/rate and keeps pitch") {
    val x = tone(1000.0, 0.5)
    Seq(0.5, 2.0).foreach { rate =>
      val y = PhaseVocoder.stretch(x, rate)
      assert(math.abs(y.length - x.length / rate) <= 2,
        s"rate=$rate: ${y.length} vs ${x.length / rate}")
      val df = Seq((1L, 0.0, toPcm(y), Sr))
        .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
      val c = centroidOf(df)
      assert(math.abs(c - 1000.0) < 80.0,
        s"rate=$rate moved the pitch: centroid $c")
    }
  }

  test("pitch shift scales pitch by 2^(n/12) and keeps duration; " +
      "0 steps is bit-exact") {
    val clips = Seq((1L, 0.0, toPcm(tone(1000.0, 0.5)), Sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val out = PhaseVocoder.pitchShift(clips, Seq(-12, 0, 12)).cache()
    val n0 = (0.5 * Sr).toInt
    val rows = out.collect().map(r =>
      r.getAs[Int]("steps") ->
        (r.getAs[Long]("n_samples"), r.getAs[Array[Byte]]("pcm"))).toMap
    assert(rows(0)._2.sameElements(toPcm(tone(1000.0, 0.5))),
      "0 steps must be a bit-exact passthrough")
    Seq(-12, 12).foreach { n =>
      assert(math.abs(rows(n)._1 - n0) <= n0 / 50,
        s"steps=$n duration ${rows(n)._1} drifted from $n0")
      val one = out.filter($"steps" === n)
        .select($"phrase_id", $"start_sec", $"pcm", $"sample_rate")
      val c = centroidOf(one)
      val want = 1000.0 * math.pow(2.0, n / 12.0)
      assert(math.abs(c - want) < want * 0.08,
        s"steps=$n centroid $c, want ~$want")
    }
    out.unpersist()
  }

  test("stretch round-trip fidelity: rate 1 reconstructs the interior") {
    val x = tone(700.0, 0.4)
    val y = PhaseVocoder.stretch(x, 1.0)
    assert(y.length === x.length)
    // interior SNR (skip nFft edges where overlap-add is partial)
    val lo = 1024; val hi = math.min(x.length, y.length) - 1024
    var ps = 0.0; var pn = 0.0
    (lo until hi).foreach { i =>
      ps += x(i) * x(i); pn += (y(i) - x(i)) * (y(i) - x(i))
    }
    val snr = 10.0 * math.log10(ps / pn)
    assert(snr > 20.0, s"rate-1 reconstruction SNR $snr dB")
  }

  test("a clip too short to frame passes through pitchShift " +
      "bit-exactly — never resampled alone (which would change its " +
      "duration: a speed perturb, not a pitch shift)") {
    val shortPcm = toPcm(tone(440.0, 500.0 / Sr)) // 500 samples < nFft
    val df = Seq((1L, shortPcm, Sr)).toDF("phrase_id", "pcm",
      "sample_rate")
    val out = PhaseVocoder.pitchShift(df, Seq(-3, 3)).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Array[Byte]]("pcm").sameElements(shortPcm),
        "short clip must pass through unchanged at every step count")
      assert(r.getAs[Long]("n_samples") == 500L)
    }
  }
}
