package graft.audio

import org.scalatest.funsuite.AnyFunSuite

/** Mel → audio inversion quality: NNLS residual, spectral placement,
  * energy, determinism. */
class MelInvertSpec extends AnyFunSuite {
  private val NFft = 512
  private val Hop = 128
  private val Sr = 22050
  private val NMels = 40

  private def tone(f: Double, n: Int, amp: Double = 0.5): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * f * i / Sr))

  private lazy val fb = Dsp.melFilterbank(NMels, NFft, Sr, 0.0, 8000.0)

  test("NNLS drives the mel-domain residual under 2%") {
    val x = tone(440, 6000).zip(tone(2000, 6000, 0.25))
      .map { case (a, b) => a + b }
    val mel = MelInvert.melFrames(x, fb, NFft, Hop)
    val p = MelInvert.melToPower(mel, fb)
    // residual ‖F·p − m‖ / ‖m‖ over all frames
    var num = 0.0; var den = 0.0
    mel.indices.foreach { t =>
      fb.indices.foreach { i =>
        var acc = 0.0
        var k = 0
        while (k < p(t).length) { acc += fb(i)(k) * p(t)(k); k += 1 }
        val d = acc - mel(t)(i)
        num += d * d; den += mel(t)(i) * mel(t)(i)
      }
    }
    val rel = math.sqrt(num / den)
    assert(rel < 0.02, s"relative mel residual $rel")
  }

  test("a tone survives the full mel round trip: frequency and " +
      "interior energy recovered") {
    val x = tone(880, 8000)
    val mel = MelInvert.melFrames(x, fb, NFft, Hop)
    val y = MelInvert.melToAudio(mel, fb, NFft, Hop, x.length)
    assert(y.length == x.length)
    // spectral centroid of the reconstruction ~ the tone frequency
    // (40 mel bands blur, so the tolerance is wider than GriffinLim's)
    val (mag, _) = GriffinLim.stft(y, NFft, Hop)
    var num = 0.0; var den = 0.0
    mag.foreach { m =>
      var k = 0
      while (k < m.length) { num += k * m(k) * m(k); den += m(k) * m(k); k += 1 }
    }
    val c = num / den * Sr / NFft
    assert(math.abs(c - 880) < 60, s"centroid $c, expected ~880")
    def rms(a: Array[Double]) =
      math.sqrt(a.map(v => v * v).sum / a.length)
    val (rx, ry) = (rms(x.slice(1000, 7000)), rms(y.slice(1000, 7000)))
    assert(math.abs(ry - rx) / rx < 0.15, s"rms $ry vs $rx")
  }

  test("deterministic and non-negative throughout") {
    val x = tone(660, 4000)
    val mel = MelInvert.melFrames(x, fb, NFft, Hop)
    val p1 = MelInvert.melToPower(mel, fb)
    val p2 = MelInvert.melToPower(mel, fb)
    assert(p1.zip(p2).forall { case (a, b) => a.sameElements(b) })
    assert(p1.forall(_.forall(_ >= 0.0)))
  }
}
