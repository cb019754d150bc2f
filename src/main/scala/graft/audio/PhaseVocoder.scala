package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-vocoder time stretch and pitch shift — the last member of the
  * standard augmentation suite (`librosa.effects.time_stretch` /
  * `pitch_shift`; Flanagan & Golden 1966, the classic STFT phase
  * vocoder): stretch changes duration without pitch by stepping
  * through STFT frames at `rate` while accumulating per-bin phase from
  * the measured inter-frame phase advance; pitch shift composes a
  * stretch by 2^(n/12) with the existing windowed-sinc resampler
  * ([[Src]]) back to the original duration.
  *
  * Scale shape: exactly the [[Src]] contract — a narrow per-clip
  * kernel (STFT → vocoder → overlap-add → resample), embarrassingly
  * parallel, no shuffle, no state. Oracle discipline: the DSP half
  * ships as dumped micro-quantized BIGINTs and DuckDB re-runs the
  * exact integer aggregation tail (the nq_speed_perturb /
  * nq_audio_resample pattern).
  */
object PhaseVocoder {

  /** Time-stretch a mono signal by `rate` (rate > 1 = faster/shorter,
    * pitch preserved). Hann STFT with 4× overlap; magnitudes linearly
    * interpolated between bracketing frames; phases accumulated from
    * wrapped inter-frame deviations against the expected per-hop
    * advance 2π·hop·k/nFft. Output length ≈ n/rate. */
  /** One constant shared by stretch's default and pitchShift's
    * short-clip guard — the two must agree (see pitchShift). */
  private[audio] val DefaultNFft = 1024

  def stretch(x: Array[Double], rate: Double, nFft: Int = DefaultNFft,
      hop: Int = 256): Array[Double] = {
    require(rate > 0.0, s"rate must be positive, got $rate")
    if (x.length < nFft) return x.clone() // too short to frame: passthrough
    val w = Dsp.hannWindow(nFft)
    // analysis STFT: the shared framing convention (tail-padded,
    // len/hop+1 frames) lives in ONE place — [[GriffinLim.stft]] —
    // so the vocoder and the reconstruction family cannot drift
    val (magF, phF) = GriffinLim.stft(x, nFft, hop)
    val nFrames = magF.length
    val nb = nFft / 2 + 1
    val twoPi = 2.0 * math.Pi
    val phiAdv = Array.tabulate(nb)(k => twoPi * hop * k / nFft)
    // synthesis: step the analysis frames at `rate`
    val nOut = math.max(1, math.ceil(nFrames / rate).toInt)
    val phAcc = phF(0).clone()
    val outLen = (nOut - 1) * hop + nFft
    val y = new Array[Double](outLen)
    val wsum = new Array[Double](outLen)
    var s = 0
    while (s < nOut) {
      val pos = s * rate
      val t0 = math.min(pos.toInt, nFrames - 1)
      val t1 = math.min(t0 + 1, nFrames - 1)
      val frac = pos - t0
      val re = new Array[Double](nFft)
      val im = new Array[Double](nFft)
      var k = 0
      while (k < nb) {
        val mag = (1.0 - frac) * magF(t0)(k) + frac * magF(t1)(k)
        re(k) = mag * math.cos(phAcc(k))
        im(k) = mag * math.sin(phAcc(k))
        // conjugate symmetry for the real inverse
        if (k > 0 && k < nFft / 2) {
          re(nFft - k) = re(k)
          im(nFft - k) = -im(k)
        }
        // advance the accumulator by expected + wrapped deviation
        val dp = phF(t1)(k) - phF(t0)(k) - phiAdv(k)
        val wrapped = dp - twoPi * math.rint(dp / twoPi)
        phAcc(k) += phiAdv(k) + wrapped
        k += 1
      }
      // inverse FFT via conjugation: ifft(X) = conj(fft(conj(X)))/n
      var i = 0
      while (i < nFft) { im(i) = -im(i); i += 1 }
      Dsp.fft(re, im)
      i = 0
      while (i < nFft) {
        val v = re(i) / nFft // real part of the inverse
        y(s * hop + i) += v * w(i)
        wsum(s * hop + i) += w(i) * w(i)
        i += 1
      }
      s += 1
    }
    var i = 0
    while (i < outLen) {
      if (wsum(i) > 1e-9) y(i) /= wsum(i)
      i += 1
    }
    java.util.Arrays.copyOf(y, math.max(1, math.round(x.length / rate).toInt))
  }

  /** Pitch-shift each clip by `steps` semitones (duration preserved):
    * vocoder-stretch by 1/f (duration ×f, pitch unchanged), then
    * windowed-sinc "speed up" by f (duration ÷f, pitch ×f), f =
    * 2^(steps/12). steps = 0 short-circuits to a bit-exact
    * passthrough, and so does a clip too short to frame (< nFft
    * samples): `stretch` passes such a clip through unchanged, so
    * running the resample alone would CHANGE its duration — a speed
    * perturb, not a pitch shift — violating the constant-duration
    * contract. One output row per (clip, steps). */
  def pitchShift(clips: DataFrame, steps: Seq[Int],
      idCol: String = "phrase_id", pcmCol: String = "pcm",
      sampleRateCol: String = "sample_rate"): DataFrame = {
    require(steps.nonEmpty && steps.forall(s => math.abs(s) <= 12),
      s"semitone steps out of the sane [-12, 12] band: $steps")
    val shift = udf { (pcm: Array[Byte], sr: Int, n: Int) =>
      // legible failure, not a bare executor NPE (the MelSpectrogram
      // rule): a null payload is an undecoded upstream row leaking in
      require(pcm != null,
        "PhaseVocoder.pitchShift: null PCM payload — filter undecoded " +
          "rows (decoded=false) before augmentation")
      val x = Dsp.pcm16ToDoubles(pcm)
      // DefaultNFft shared with stretch: a drifted guard would let
      // short clips pass through stretch unchanged and then resample
      // alone — a duration change, violating this op's contract
      if (n == 0 || x.length < DefaultNFft) pcm
      else {
        val f = math.pow(2.0, n / 12.0)
        val stretched = stretch(x, 1.0 / f)
        // stay in doubles through the resample; quantize ONCE at the end
        Dsp.doublesToPcm16(
          Src.resample(stretched, sr, math.round(sr / f).toInt))
      }
    }
    clips
      .withColumn("steps", explode(typedLit(steps)))
      .withColumn(pcmCol,
        shift(col(pcmCol), col(sampleRateCol).cast("int"), col("steps")))
      .withColumn("n_samples", (length(col(pcmCol)) / 2).cast("long"))
  }
}
