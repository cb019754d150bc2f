package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DCT-II golden properties + the MFCC column over real mel frames. */
class MfccSpec extends SparkSpec {
  import spark.implicits._

  test("dct2: constant input concentrates in c0; Parseval holds") {
    val n = 20
    val const = Array.fill(n)(3.0)
    val y = Dsp.dct2(const, n)
    assert(math.abs(y(0) - 3.0 * math.sqrt(n.toDouble)) < 1e-9)
    assert(y.drop(1).forall(v => math.abs(v) < 1e-9),
      "a constant has no AC coefficients")
    // orthonormal: energy is preserved over the full transform
    val x = Array.tabulate(n)(i => math.sin(0.7 * i) + 0.3 * i)
    val fx = Dsp.dct2(x, n)
    assert(math.abs(x.map(v => v * v).sum - fx.map(v => v * v).sum) < 1e-9)
  }

  test("dct2: a cosine basis vector concentrates at its own index") {
    val n = 32; val k0 = 5
    val x = Array.tabulate(n)(i => math.cos(math.Pi * (i + 0.5) * k0 / n))
    val y = Dsp.dct2(x, n)
    val mag = y.map(math.abs)
    assert(mag.indexOf(mag.max) === k0)
    assert(mag.zipWithIndex.filter(_._2 != k0).map(_._1).max < 1e-9,
      "orthogonality: every other coefficient vanishes")
  }

  test("mfcc column over synthesized mel frames: shape + determinism") {
    val gen = graft.gen.VoiceDataGen.generate(spark, nPhrases = 2, seed = 7L)
    val mel = new MelSpectrogram().setIdCol("phrase_id").setPcmCol("pcm")
      .setStartSecCol("start_sec").setSampleRateCol("sample_rate")
      .transform(gen)
    val out = Mfcc.withMfcc(mel).cache()
    assert(out.count() > 0)
    assert(out.filter(size($"mfcc") =!= 13).count() === 0,
      "every frame carries 13 coefficients")
    val a = out.orderBy("phrase_id", "frame_id")
      .select("mfcc").limit(5).collect().map(_.getSeq[Double](0))
    val b = Mfcc.withMfcc(mel).orderBy("phrase_id", "frame_id")
      .select("mfcc").limit(5).collect().map(_.getSeq[Double](0))
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "deterministic")
    // c0 tracks overall log-energy: louder frame (higher mel sum) has
    // larger first coefficient than a near-silent one, if both exist
    out.unpersist()
  }

  test("mfcc: null and empty mel arrays degrade to null, not a job failure") {
    val rows = Seq(
      (1L, Some(Seq(1.0, 2.0, 3.0, 4.0))),
      (2L, Some(Seq.empty[Double])),
      (3L, Option.empty[Seq[Double]])
    ).toDF("frame_id", "mel")
    val out = Mfcc.withMfcc(rows, nMfcc = 4).orderBy("frame_id").collect()
    assert(out(0).getSeq[Double](2).length === 4)
    assert(out(1).isNullAt(2), "empty mel -> null mfcc")
    assert(out(2).isNullAt(2), "null mel -> null mfcc")
  }
}
