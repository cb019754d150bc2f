package graft.audio

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-style checks for the MelSpectrogram transformer: frame count,
  * time axis, and that a pure tone's energy lands in the right mel band.
  */
class MelSpectrogramSpec extends SparkSpec {
  import spark.implicits._

  private def tonePcm(freq: Double, seconds: Double, sr: Int): Array[Byte] = {
    val n = (seconds * sr).toInt
    val out = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (0.5 * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt.toShort
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  private val sr = 22050

  private def frames(freq: Double) = {
    val clips = Seq((0L, 0.0, tonePcm(freq, 2.0, sr), sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    new MelSpectrogram().transform(clips)
  }

  test("miswired pipeline fails at schema time; null pcm fails with row context") {
    // missing pcm column → legible error from transformSchema, so
    // Pipeline.fit rejects the wiring instead of dying mid-run
    val noPcm = Seq((0L, 0.0, sr)).toDF("phrase_id", "start_sec", "sample_rate")
    val e1 = intercept[IllegalArgumentException] {
      new MelSpectrogram().transformSchema(noPcm.schema)
    }
    assert(e1.getMessage.contains("pcm"))
    // wrong type for pcm → named column and type in the message
    val strPcm = Seq((0L, 0.0, "x", sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val e2 = intercept[IllegalArgumentException] {
      new MelSpectrogram().transform(strPcm)
    }
    assert(e2.getMessage.contains("BINARY"))
    // null payload (an undecoded verdict row leaking in) → row-contextual
    // require, not a bare NPE from inside the DSP kernel
    val nullPcm = Seq((7L, 0.0, null: Array[Byte], sr))
      .toDF("phrase_id", "start_sec", "pcm", "sample_rate")
    val e3 = intercept[org.apache.spark.SparkException] {
      new MelSpectrogram().transform(nullPcm).count()
    }
    assert(e3.getMessage.contains("id=7") ||
      Option(e3.getCause).exists(_.getMessage.contains("id=7")))
  }

  test("frame count and time axis match hop/n_fft") {
    val f = frames(440.0).cache()
    val n = (2.0 * sr).toInt
    val expected = (n - 2048) / 512 + 1
    assert(f.count() == expected)
    val times = f.orderBy("frame_id").select("frame_time").as[Double]
      .take(3)
    assert(math.abs(times(0) - 0.0) < 1e-9)
    assert(math.abs(times(1) - 512.0 / sr) < 1e-9)
    val mels = f.select(size($"mel")).distinct().as[Int].collect()
    assert(mels.toSeq == Seq(20))
  }

  test("pure-tone energy concentrates in the expected mel band, and a " +
    "higher tone lands in a higher band") {
    def peakBand(freq: Double): Int = {
      val melRow = frames(freq).orderBy("frame_id").select("mel")
        .as[Seq[Double]].take(5).last // skip attack frames
      melRow.indices.maxBy(melRow)
    }
    val low = peakBand(300.0)
    val high = peakBand(4000.0)
    assert(low < high, s"300Hz band $low !< 4kHz band $high")
    // 300 Hz sits in the low quarter of 20 Slaney bands to 8 kHz
    assert(low <= 5, s"300Hz band too high: $low")
    assert(high >= 12, s"4kHz band too low: $high")
  }

  test("power_to_db: values in [-80, 0], max is 0") {
    val db = MelSpectrogram.toDb(frames(440.0))
    val stats = db.select(explode($"mel_db").as("v"))
      .agg(min("v"), max("v")).as[(Double, Double)].head()
    assert(stats._1 >= -80.0 - 1e-9)
    assert(math.abs(stats._2) < 1e-9, s"global max dB should be 0, got ${stats._2}")
  }
}
