package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Griffin–Lim phase reconstruction — audio from a magnitude-only
  * spectrogram (`librosa.griffinlim`; Griffin & Lim 1984, "Signal
  * Estimation from Modified Short-Time Fourier Transform"): alternate
  * projection between the set of signals consistent with SOME phase
  * (istft→stft round trip) and the set with the TARGET magnitudes
  * (magnitude replacement), which provably never increases the
  * spectrogram distance ‖S_target − |STFT(x_k)|‖ (the 1984 theorem —
  * spec-pinned as a monotonicity assertion). Completes the audio
  * tier's synthesis story: mel/MFCC go signal→features, the phase
  * vocoder edits, Griffin–Lim comes BACK from features to signal —
  * the standard last stage of classic TTS/vocoder pipelines
  * (e.g. Tacotron before neural vocoders).
  *
  * Deterministic variant: zero phase init (librosa defaults to seeded
  * random; zeros make the operator a pure function of its input —
  * the engine's oracle discipline requires it, and for speech-like
  * signals zero init converges comparably, cf. librosa's `init=None`
  * option).
  *
  * Scale shape: the [[Src]]/[[PhaseVocoder]] contract — per-clip
  * kernel (frames → iterate → overlap-add), embarrassingly parallel
  * over clips, no shuffle, no state; n_iter bounds the per-row cost.
  */
object GriffinLim {

  /** Hann STFT: (nFrames × (nFft/2+1)) magnitude+phase pair, framing
    * convention shared with [[PhaseVocoder.stretch]] (hop-strided
    * frames over a tail-padded signal). */
  private[audio] def stft(x: Array[Double], nFft: Int, hop: Int)
      : (Array[Array[Double]], Array[Array[Double]]) = {
    val w = Dsp.hannWindow(nFft)
    val xp = java.util.Arrays.copyOf(x, x.length + nFft)
    val nFrames = x.length / hop + 1
    val nb = nFft / 2 + 1
    val mag = new Array[Array[Double]](nFrames)
    val ph = new Array[Array[Double]](nFrames)
    var t = 0
    while (t < nFrames) {
      val re = new Array[Double](nFft)
      val im = new Array[Double](nFft)
      var i = 0
      while (i < nFft) { re(i) = xp(t * hop + i) * w(i); i += 1 }
      Dsp.fft(re, im)
      val m = new Array[Double](nb)
      val p = new Array[Double](nb)
      var k = 0
      while (k < nb) {
        m(k) = math.hypot(re(k), im(k))
        p(k) = math.atan2(im(k), re(k))
        k += 1
      }
      mag(t) = m; ph(t) = p
      t += 1
    }
    (mag, ph)
  }

  /** Inverse STFT via conjugate-symmetric inverse FFT + windowed
    * overlap-add with window-square normalization (the
    * [[PhaseVocoder]] synthesis convention). `outLen` trims to the
    * original signal length. */
  private[audio] def istft(mag: Array[Array[Double]],
      ph: Array[Array[Double]], nFft: Int, hop: Int,
      outLen: Int): Array[Double] = {
    val w = Dsp.hannWindow(nFft)
    val nFrames = mag.length
    val nb = nFft / 2 + 1
    val full = (nFrames - 1) * hop + nFft
    val y = new Array[Double](full)
    val wsum = new Array[Double](full)
    var t = 0
    while (t < nFrames) {
      val re = new Array[Double](nFft)
      val im = new Array[Double](nFft)
      var k = 0
      while (k < nb) {
        re(k) = mag(t)(k) * math.cos(ph(t)(k))
        im(k) = mag(t)(k) * math.sin(ph(t)(k))
        if (k > 0 && k < nFft / 2) {
          re(nFft - k) = re(k)
          im(nFft - k) = -im(k)
        }
        k += 1
      }
      // ifft(X) = conj(fft(conj(X)))/n, real part
      var i = 0
      while (i < nFft) { im(i) = -im(i); i += 1 }
      Dsp.fft(re, im)
      i = 0
      while (i < nFft) {
        val v = re(i) / nFft
        y(t * hop + i) += v * w(i)
        wsum(t * hop + i) += w(i) * w(i)
        i += 1
      }
      t += 1
    }
    var i = 0
    while (i < full) {
      if (wsum(i) > 1e-9) y(i) /= wsum(i)
      i += 1
    }
    java.util.Arrays.copyOf(y, outLen)
  }

  /** Reconstruct a signal of length `outLen` from target magnitudes
    * alone. Classic alternating projections, zero phase init. */
  def reconstruct(target: Array[Array[Double]], nFft: Int, hop: Int,
      outLen: Int, nIter: Int): Array[Double] = {
    require(nIter >= 1, s"nIter must be >= 1, got $nIter")
    // after iteration 1 the phases come from stft of an outLen-length
    // signal (outLen/hop + 1 frames); a mismatched target would read
    // past that array inside an executor with no context — fail
    // legibly at entry instead (r18 review)
    require(target.length == outLen / hop + 1,
      s"reconstruct: target has ${target.length} frames but outLen " +
        s"$outLen at hop $hop frames to ${outLen / hop + 1} — the " +
        "magnitudes and the requested length disagree")
    var ph = Array.fill(target.length)(new Array[Double](nFft / 2 + 1))
    var x: Array[Double] = null
    var it = 0
    while (it < nIter) {
      x = istft(target, ph, nFft, hop, outLen)
      ph = stft(x, nFft, hop)._2
      it += 1
    }
    // final projection onto the target-magnitude set
    istft(target, ph, nFft, hop, outLen)
  }

  /** Spectrogram-consistency distance ‖S − |STFT(x)|‖_F — the quantity
    * the 1984 theorem drives downward; exposed for the spec. */
  private[audio] def consistency(target: Array[Array[Double]],
      x: Array[Double], nFft: Int, hop: Int): Double = {
    val got = stft(x, nFft, hop)._1
    var s = 0.0
    var t = 0
    while (t < target.length && t < got.length) {
      var k = 0
      while (k < target(t).length) {
        val d = target(t)(k) - got(t)(k)
        s += d * d
        k += 1
      }
      t += 1
    }
    math.sqrt(s)
  }

  /** Magnitude-spectrogram → PCM round trip per clip: STFT magnitudes
    * (phases DISCARDED), Griffin–Lim back to a PCM column. One output
    * row per clip, no shuffle. */
  def invertClips(clips: DataFrame, nFft: Int, hop: Int, nIter: Int,
      pcmCol: String = "pcm"): DataFrame = {
    val gl = udf { pcm: Array[Byte] =>
      // legible failure, not a bare executor NPE (the MelSpectrogram
      // rule): a null payload is an undecoded upstream row leaking in
      require(pcm != null,
        "GriffinLim.invertClips: null PCM payload — filter undecoded " +
          "rows (decoded=false) before inversion")
      val x = Dsp.pcm16ToDoubles(pcm)
      if (x.length < nFft) pcm // too short to frame: passthrough
      else {
        val mags = stft(x, nFft, hop)._1
        Dsp.doublesToPcm16(reconstruct(mags, nFft, hop, x.length, nIter))
      }
    }
    clips.withColumn(pcmCol, gl(col(pcmCol)))
  }
}
