package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mel-spectrogram inversion — `librosa.feature.inverse.mel_to_stft`
  * + `mel_to_audio`: recover a linear power spectrum from each mel
  * frame by non-negative least squares against the SAME Slaney
  * filterbank the forward transform used ([[Dsp.melFilterbank]]),
  * then hand √power magnitudes to [[GriffinLim]] for phase recovery.
  * Closes the audio loop end-to-end: signal → mel (MelSpectrogram) →
  * signal (this) — the full classic-vocoder path (Tacotron-era TTS
  * reconstructed exactly this way before neural vocoders).
  *
  * NNLS solver: fixed-count Lee–Seung multiplicative updates
  * (Lee & Seung 2001, "Algorithms for Non-negative Matrix
  * Factorization" — with one factor frozen, NMF reduces to NNLS):
  * p ← p ∘ (Fᵀm) / (Fᵀ(Fp)), initialized at Fᵀm. Deterministic
  * (fixed iterations, no active-set pivoting — librosa's scipy NNLS
  * substitute, chosen for the engine's bit-replayable-oracle
  * discipline), multiplicative so p ≥ 0 by construction, and each
  * update is two filterbank products (O(nMels·nBins)), not the
  * O(nBins²) normal-equations form.
  *
  * Scale shape: per-clip kernel like [[GriffinLim]]/[[Src]] — no
  * shuffle, no state, embarrassingly parallel over clips.
  */
object MelInvert {

  /** NNLS per frame: power spectra (nFrames × nBins) from mel frames
    * (nFrames × nMels) under filterbank `fb` (nMels × nBins). */
  private[audio] def melToPower(mel: Array[Array[Double]],
      fb: Array[Array[Double]], nIter: Int = 100)
      : Array[Array[Double]] = {
    val nMels = fb.length
    val nBins = fb(0).length
    val eps = 1e-12
    mel.map { m =>
      // Fᵀm: loop-invariant numerator AND the initial p in one array
      // (computing it inside the iteration would double the per-update
      // filterbank work for a constant)
      val ftm = new Array[Double](nBins)
      var k = 0
      while (k < nBins) {
        var acc = 0.0
        var i = 0
        while (i < nMels) { acc += fb(i)(k) * m(i); i += 1 }
        ftm(k) = acc
        k += 1
      }
      val p = ftm.clone()
      val fp = new Array[Double](nMels)
      var it = 0
      while (it < nIter) {
        // fp = F·p
        var i = 0
        while (i < nMels) {
          var acc = 0.0
          var kk = 0
          while (kk < nBins) { acc += fb(i)(kk) * p(kk); kk += 1 }
          fp(i) = acc
          i += 1
        }
        // p ∘= (Fᵀm) / (Fᵀfp)
        k = 0
        while (k < nBins) {
          var den = 0.0
          i = 0
          while (i < nMels) { den += fb(i)(k) * fp(i); i += 1 }
          p(k) = p(k) * (ftm(k) / (den + eps))
          k += 1
        }
        it += 1
      }
      p
    }
  }

  /** Forward mel frames with [[GriffinLim.stft]] framing (tail-padded,
    * len/hop+1 frames) so inversion round-trips to the exact input
    * length. */
  private[audio] def melFrames(x: Array[Double],
      fb: Array[Array[Double]], nFft: Int, hop: Int)
      : Array[Array[Double]] =
    GriffinLim.stft(x, nFft, hop)._1.map { mag =>
      val nMels = fb.length
      val m = new Array[Double](nMels)
      var i = 0
      while (i < nMels) {
        var acc = 0.0
        var k = 0
        while (k < mag.length) {
          acc += fb(i)(k) * mag(k) * mag(k) // power = |mag|²
          k += 1
        }
        m(i) = acc
        i += 1
      }
      m
    }

  /** Mel frames → signal: NNLS to power, √ to magnitude, Griffin–Lim
    * to phase. */
  def melToAudio(mel: Array[Array[Double]], fb: Array[Array[Double]],
      nFft: Int, hop: Int, outLen: Int, nnlsIter: Int = 100,
      glIter: Int = 16): Array[Double] = {
    val mags = melToPower(mel, fb, nnlsIter).map(_.map(math.sqrt))
    GriffinLim.reconstruct(mags, nFft, hop, outLen, glIter)
  }

  /** Full round trip per clip: PCM → mel (nMels bands, the forward
    * conventions) → NNLS + Griffin–Lim → PCM. One row per clip, no
    * shuffle. */
  def roundTripClips(clips: DataFrame, nMels: Int, nFft: Int, hop: Int,
      fMax: Double = 8000.0, pcmCol: String = "pcm",
      sampleRateCol: String = "sample_rate"): DataFrame = {
    val rt = udf { (pcm: Array[Byte], sr: Int) =>
      // legible failure, not a bare executor NPE (the MelSpectrogram
      // rule): a null payload is an undecoded upstream row leaking in
      require(pcm != null,
        "MelInvert.roundTripClips: null PCM payload — filter " +
          "undecoded rows (decoded=false) before the round trip")
      val x = Dsp.pcm16ToDoubles(pcm)
      if (x.length < nFft) pcm
      else {
        val fb = Dsp.melFilterbank(nMels, nFft, sr, 0.0, fMax)
        val mel = melFrames(x, fb, nFft, hop)
        Dsp.doublesToPcm16(melToAudio(mel, fb, nFft, hop, x.length))
      }
    }
    clips.withColumn(pcmCol,
      rt(col(pcmCol), col(sampleRateCol).cast("int")))
  }
}
