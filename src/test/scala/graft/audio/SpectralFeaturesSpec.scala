package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Signal-theory golden properties for the spectral feature pack, the
  * delta kernel, and SpecAugment masking. */
class SpectralFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 22050

  private def pcm(samples: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s16 = math.max(-32767,
        math.min(32767, (samples(i) * 32767.0).toInt)).toShort
      out(2 * i) = (s16 & 0xff).toByte
      out(2 * i + 1) = ((s16 >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  private def tone(freq: Double, sec: Double): Array[Byte] =
    pcm(Array.tabulate((sec * Sr).toInt)(i =>
      0.6 * math.sin(2.0 * math.Pi * freq * i / Sr)))

  private def noise(sec: Double): Array[Byte] = {
    var s = 0x9e3779b97f4a7c15L // deterministic splitmix64 stream
    pcm(Array.tabulate((sec * Sr).toInt) { _ =>
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue) * 0.5
    })
  }

  private def clips = Seq(
    (1L, 0.0, tone(1000.0, 0.5), Sr), // pure tone
    (2L, 0.0, noise(0.5), Sr) // broadband noise
  ).toDF("phrase_id", "start_sec", "pcm", "sample_rate")

  test("spectral features: tone vs noise match signal theory") {
    val feats = SpectralFeatures.withFeatures(
      SpectralFeatures.frameSpectra(clips, nFft = 512, hop = 256))
    val t = feats.filter($"phrase_id" === 1L)
      .agg(avg("centroid"), avg("flatness"), avg("zcr"), avg("rms"),
        avg("rolloff"), avg("bandwidth"))
      .head()
    // a 1 kHz tone's centroid sits at 1 kHz (± one 43 Hz bin of
    // window leakage), its ZCR is 2·f/sr, its flatness near zero
    assert(math.abs(t.getDouble(0) - 1000.0) < 50.0,
      s"tone centroid ${t.getDouble(0)}")
    assert(t.getDouble(1) < 0.01, s"tone flatness ${t.getDouble(1)}")
    assert(math.abs(t.getDouble(2) - 2.0 * 1000.0 / Sr) < 0.01,
      s"tone zcr ${t.getDouble(2)}")
    // rms of a 0.6-amplitude sine = 0.6/sqrt(2)
    assert(math.abs(t.getDouble(3) - 0.6 / math.sqrt(2.0)) < 0.01,
      s"tone rms ${t.getDouble(3)}")
    // rolloff of a tone hugs the tone; bandwidth is narrow
    assert(math.abs(t.getDouble(4) - 1000.0) < 60.0,
      s"tone rolloff ${t.getDouble(4)}")
    val n = feats.filter($"phrase_id" === 2L)
      .agg(avg("flatness"), avg("bandwidth"), avg("rolloff")).head()
    assert(n.getDouble(0) > 0.2,
      s"noise flatness ${n.getDouble(0)} must be far above the tone's")
    assert(n.getDouble(1) > t.getDouble(5) * 5.0,
      "noise bandwidth dwarfs the tone's")
    assert(n.getDouble(2) > 5000.0,
      s"broadband rolloff ${n.getDouble(2)} sits high")
  }

  test("delta kernel: a linear ramp's interior slope is exact; edges clamp") {
    val ramp = (0 until 20).map(t => (1L, 0L, t.toLong, 2.5 * t))
      .toDF("phrase_id", "k", "frame_id", "v")
    val d = Delta.withDelta(ramp, "v", "dv",
      Seq("phrase_id", "k"), "frame_id", nD = 4)
      .orderBy("frame_id").select("dv").as[Double].collect()
    // interior: Σ d·(2.5(t+d) − 2.5(t−d)) / (2Σd²) = 2.5 exactly
    d.slice(4, 16).foreach(v => assert(math.abs(v - 2.5) < 1e-12))
    // replicated edges damp the estimate toward zero, never past it
    assert(d.head > 0 && d.head < 2.5 && d.last > 0 && d.last < 2.5)
    // constant track -> zero delta everywhere (edge clamp included)
    val const = (0 until 10).map(t => (1L, 0L, t.toLong, 7.0))
      .toDF("phrase_id", "k", "frame_id", "v")
    val dc = Delta.withDelta(const, "v", "dv",
      Seq("phrase_id", "k"), "frame_id").select("dv").as[Double].collect()
    assert(dc.forall(_ == 0.0))
  }

  test("specaugment: masks land in range, zero exactly their cells, " +
      "and are seed-deterministic") {
    val nBins = 20
    val mel = new MelSpectrogram().transform(clips)
    val exploded = mel.select($"phrase_id", $"frame_id",
      posexplode($"mel").as(Seq("k", "v")))
    val masks = SpecAugment.drawMasks(mel, nBins, seed = 11L).cache()
    val nFrames = mel.groupBy("phrase_id")
      .agg((max("frame_id") + 1L).as("nf"))
    // every mask fits inside its clip's extent
    val bad = masks.join(nFrames, "phrase_id").filter(
      ($"kind" === "t" && ($"start" < 0 ||
        $"start" + $"width" > $"nf")) ||
      ($"kind" === "f" && ($"start" < 0 ||
        $"start" + $"width" > nBins))).count()
    assert(bad === 0)
    assert(masks.count() === 2 * (2 + 2), "2 clips x (2 t + 2 f) masks")
    val out = SpecAugment.applyMasks(exploded, masks).cache()
    // masked cells are zero; every cell OUTSIDE the mask rectangles is
    // bitwise untouched (compared against the pre-mask values, so a
    // naturally-zero input can't fake a pass either way)
    val hit = exploded.join(masks, Seq("phrase_id"))
      .filter(($"kind" === "t" && $"frame_id" >= $"start" &&
          $"frame_id" < $"start" + $"width") ||
        ($"kind" === "f" && $"k" >= $"start" &&
          $"k" < $"start" + $"width"))
      .select("phrase_id", "frame_id", "k").distinct()
    val joined = out.withColumnRenamed("v", "v_out")
      .join(exploded, Seq("phrase_id", "frame_id", "k"))
      .join(hit.withColumn("in_mask", lit(true)),
        Seq("phrase_id", "frame_id", "k"), "left")
    assert(joined.filter($"in_mask" && $"v_out" =!= 0.0).count() === 0,
      "every masked cell is zeroed")
    assert(joined.filter($"in_mask".isNull && $"v_out" =!= $"v")
      .count() === 0, "unmasked cells pass through bitwise")
    assert(out.count() === exploded.count(), "masking never drops rows")
    // same seed -> same masks; different seed -> different
    val again = SpecAugment.drawMasks(mel, nBins, seed = 11L)
    assert(masks.exceptAll(again).count() === 0)
    val other = SpecAugment.drawMasks(mel, nBins, seed = 12L)
    assert(masks.exceptAll(other).count() > 0)
    masks.unpersist(); out.unpersist()
  }
}
