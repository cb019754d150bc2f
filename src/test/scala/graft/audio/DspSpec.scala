package graft.audio

import org.scalatest.funsuite.AnyFunSuite

class DspSpec extends AnyFunSuite {

  test("fft matches naive DFT on a small random signal") {
    val n = 64
    val rnd = new scala.util.Random(7)
    val x = Array.fill(n)(rnd.nextDouble() - 0.5)
    val re = x.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    // naive DFT
    for (k <- 0 until n) {
      var sr = 0.0; var si = 0.0
      for (t <- 0 until n) {
        val ang = -2.0 * math.Pi * k * t / n
        sr += x(t) * math.cos(ang); si += x(t) * math.sin(ang)
      }
      assert(math.abs(re(k) - sr) < 1e-9, s"re bin $k")
      assert(math.abs(im(k) - si) < 1e-9, s"im bin $k")
    }
  }

  test("power spectrum of a pure tone peaks at the tone's bin") {
    val n = 512; val sr = 22050
    val binFreq = 40.0 * sr / n // exactly bin 40
    val x = Array.tabulate(n)(i => math.sin(2 * math.Pi * binFreq * i / sr))
    val ps = Dsp.powerSpectrum(x, Dsp.hannWindow(n))
    val peak = ps.indices.maxBy(ps)
    assert(peak == 40, s"expected peak at bin 40, got $peak")
  }

  test("mel filterbank: rows nonzero, centers ascending, Slaney-normalized") {
    val fb = Dsp.melFilterbank(nMels = 20, nFft = 2048, sampleRate = 22050)
    assert(fb.length == 20 && fb.head.length == 1025)
    val centers = fb.map(row => row.indices.maxBy(row))
    assert(centers.sameElements(centers.sorted), "filter centers must ascend")
    fb.foreach(row => assert(row.exists(_ > 0.0), "empty mel filter"))
    // Slaney norm: triangle area ≈ bandwidth/2 * height(2/bandwidth) = 1
    // → row sums over the fft grid are O(1/binwidth)-scaled, just sanity:
    assert(fb.map(_.sum).forall(s => s > 0 && s < 10))
  }

  test("mel scale round-trips and is linear below 1 kHz") {
    for (f <- Seq(0.0, 440.0, 999.0, 1000.0, 4000.0, 8000.0)) {
      assert(math.abs(Dsp.melToHz(Dsp.hzToMel(f)) - f) < 1e-6, s"roundtrip $f")
    }
    assert(math.abs(Dsp.hzToMel(500.0) - 500.0 * 3 / 200) < 1e-12)
  }

  test("pcm16 roundtrip") {
    val xs = Array(0.0, 0.5, -0.5, 0.999, -0.999)
    val pcm = new Array[Byte](xs.length * 2)
    xs.zipWithIndex.foreach { case (v, i) =>
      val s = (v * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val back = Dsp.pcm16ToDoubles(pcm)
    xs.zip(back).foreach { case (a, b) => assert(math.abs(a - b) < 1e-3) }
  }
}
