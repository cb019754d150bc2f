package graft.audio

/** Pure-Scala DSP primitives for the mel-spectrogram path
  * (reference: `librosa.feature.melspectrogram`,
  * `/root/reference/src/voice_classifier.py:82`). No native deps —
  * published textbook formulas only (Cooley–Tukey radix-2 FFT, Hann
  * window, Slaney-style mel filterbank as defined in the librosa docs /
  * Slaney's Auditory Toolbox).
  */
object Dsp {

  /** In-place iterative radix-2 Cooley–Tukey FFT.
    * re/im are length n = power of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    // bit reversal
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr; im(b) = im(a) - vi
          re(a) += vr; im(a) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Periodic Hann window of length n (matches the STFT convention). */
  def hannWindow(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / n))

  /** Power spectrum |FFT(x·w)|² of one frame, bins 0..n/2 inclusive. */
  def powerSpectrum(frame: Array[Double], window: Array[Double]): Array[Double] = {
    val n = window.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) { re(i) = frame(i) * window(i); i += 1 }
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }

  // ----- Slaney-style mel scale (librosa default, htk=false) -----
  private val FMinLog = 1000.0
  private val LinStep = 200.0 / 3.0
  private val LogStep = math.log(6.4) / 27.0

  def hzToMel(hz: Double): Double =
    if (hz < FMinLog) hz / LinStep
    else FMinLog / LinStep + math.log(hz / FMinLog) / LogStep

  def melToHz(mel: Double): Double = {
    val minLogMel = FMinLog / LinStep
    if (mel < minLogMel) mel * LinStep
    else FMinLog * math.exp(LogStep * (mel - minLogMel))
  }

  /** Triangular mel filterbank, Slaney-normalized (each filter scaled by
    * 2 / bandwidth-in-Hz), shape nMels × (nFft/2 + 1).
    */
  def melFilterbank(nMels: Int, nFft: Int, sampleRate: Int,
      fMin: Double = 0.0, fMax: Double = 8000.0): Array[Array[Double]] = {
    val nBins = nFft / 2 + 1
    val fftFreqs = Array.tabulate(nBins)(k => k.toDouble * sampleRate / nFft)
    val melPts = {
      val lo = hzToMel(fMin); val hi = hzToMel(fMax)
      Array.tabulate(nMels + 2)(i => melToHz(lo + (hi - lo) * i / (nMels + 1)))
    }
    Array.tabulate(nMels) { m =>
      val (fLo, fC, fHi) = (melPts(m), melPts(m + 1), melPts(m + 2))
      val enorm = 2.0 / (fHi - fLo)
      Array.tabulate(nBins) { k =>
        val f = fftFreqs(k)
        val up = (f - fLo) / (fC - fLo)
        val down = (fHi - f) / (fHi - fC)
        math.max(0.0, math.min(up, down)) * enorm
      }
    }
  }

  /** Orthonormal DCT-II (the librosa/scipy `norm='ortho'` convention):
    *   y[k] = s_k · Σ_n x[n] · cos(π·(n + ½)·k / N),
    *   s_0 = √(1/N), s_k = √(2/N) for k ≥ 1
    * — an orthonormal transform (Parseval holds), so truncating to the
    * first `nOut` coefficients is the standard MFCC compaction. O(N²)
    * by design: N here is the mel-band count (≤ dozens), far below any
    * FFT-crossover.
    */
  def dct2(x: Array[Double], nOut: Int): Array[Double] = {
    val n = x.length
    require(n > 0, "dct2: empty input")
    require(nOut > 0 && nOut <= n, s"dct2: nOut $nOut out of range 1..$n")
    val out = new Array[Double](nOut)
    val s0 = math.sqrt(1.0 / n)
    val sk = math.sqrt(2.0 / n)
    var k = 0
    while (k < nOut) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x(i) * math.cos(math.Pi * (i + 0.5) * k / n)
        i += 1
      }
      out(k) = acc * (if (k == 0) s0 else sk)
      k += 1
    }
    out
  }

  /** [-1, 1] doubles → 16-bit little-endian PCM, floor(v·32768 + ½)
    * rounding with saturation — the ONE quantizer every synthesis
    * path shares (PhaseVocoder, GriffinLim, MelInvert); its exact
    * rounding tree is oracle-pinned by the dumped-BIGINT entries, so
    * a change here is a contract change, never a per-file tweak. */
  def doublesToPcm16(x: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](x.length * 2)
    var i = 0
    while (i < x.length) {
      val s = math.max(-32768.0,
        math.min(32767.0, math.floor(x(i) * 32768.0 + 0.5))).toInt
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** 16-bit little-endian PCM bytes → [-1, 1] doubles. */
  def pcm16ToDoubles(pcm: Array[Byte]): Array[Double] = {
    // fail fast on malformed input instead of silently dropping the
    // trailing byte and shifting every downstream frame
    require(pcm.length % 2 == 0,
      s"pcm16ToDoubles: odd byte count ${pcm.length} is not 16-bit PCM")
    val n = pcm.length / 2
    Array.tabulate(n) { i =>
      val lo = pcm(2 * i) & 0xff
      val hi = pcm(2 * i + 1).toInt
      ((hi << 8) | lo).toShort / 32768.0
    }
  }
}
