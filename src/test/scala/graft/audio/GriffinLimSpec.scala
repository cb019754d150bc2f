package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Signal-theory properties of Griffin-Lim reconstruction. */
class GriffinLimSpec extends AnyFunSuite {
  private val NFft = 512
  private val Hop = 128
  private val Sr = 16000

  private def tone(f: Double, n: Int, amp: Double = 0.5): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * f * i / Sr))

  private def centroid(x: Array[Double]): Double = {
    val (mag, _) = GriffinLim.stft(x, NFft, Hop)
    // energy-weighted mean bin over all frames
    var num = 0.0; var den = 0.0
    mag.foreach { m =>
      var k = 0
      while (k < m.length) { num += k * m(k) * m(k); den += m(k) * m(k); k += 1 }
    }
    num / den * Sr / NFft
  }

  test("the 1984 theorem: spectrogram consistency is non-increasing " +
      "in iterations and strictly improves over one projection") {
    // a two-tone signal whose phase structure matters
    val x = tone(440, 8000).zip(tone(1313, 8000)).map { case (a, b) => a + b }
    val target = GriffinLim.stft(x, NFft, Hop)._1
    val errs = Seq(1, 2, 4, 8, 16).map { it =>
      val y = GriffinLim.reconstruct(target, NFft, Hop, x.length, it)
      GriffinLim.consistency(target, y, NFft, Hop)
    }
    errs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"consistency increased: $errs")
    }
    assert(errs.last < errs.head * 0.9,
      s"16 iters should beat 1 iter clearly: $errs")
  }

  test("a pure tone reconstructs at the right frequency with the " +
      "right energy from magnitudes alone") {
    val x = tone(880, 8000)
    val target = GriffinLim.stft(x, NFft, Hop)._1
    val y = GriffinLim.reconstruct(target, NFft, Hop, x.length, 16)
    assert(y.length == x.length)
    val c = centroid(y)
    assert(math.abs(c - 880) < 25, s"centroid $c, expected ~880")
    def rms(a: Array[Double]) =
      math.sqrt(a.map(v => v * v).sum / a.length)
    // edge frames lose a little energy to the OLA taper; interior
    // energy must match within 10%
    val (rx, ry) = (rms(x.slice(1000, 7000)), rms(y.slice(1000, 7000)))
    assert(math.abs(ry - rx) / rx < 0.1, s"rms $ry vs $rx")
  }

  test("stft→istft with TRUE phases is near-perfect (the projection " +
      "pair is a consistent transform pair)") {
    val x = tone(700, 6000, amp = 0.4)
    val (mag, ph) = GriffinLim.stft(x, NFft, Hop)
    val y = GriffinLim.istft(mag, ph, NFft, Hop, x.length)
    // interior samples (edges are window-taper-degraded)
    val err = (Hop until x.length - NFft).map(i => math.abs(x(i) - y(i))).max
    assert(err < 1e-9, s"round-trip interior error $err")
  }

  test("deterministic: identical input gives bit-identical output") {
    val x = tone(523, 4000)
    val target = GriffinLim.stft(x, NFft, Hop)._1
    val a = GriffinLim.reconstruct(target, NFft, Hop, x.length, 8)
    val b = GriffinLim.reconstruct(target, NFft, Hop, x.length, 8)
    assert(a.sameElements(b))
  }
}
