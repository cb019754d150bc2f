package graft.gen

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VoiceDataGenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gen = VoiceDataGen.generate(spark, 6, seed = 42L).cache()

  test("deterministic: same seed → identical dataset") {
    val again = VoiceDataGen.generate(spark, 6, seed = 42L)
    val a = gen.select("phrase_id", "text", "n_samples")
      .orderBy("phrase_id").collect()
    val b = again.select("phrase_id", "text", "n_samples")
      .orderBy("phrase_id").collect()
    assert(a.sameElements(b))
  }

  test("speakers alternate Male/Female starting Male (reference B4)") {
    val sp = gen.orderBy("phrase_id").select("speaker").as[String].collect()
    sp.zipWithIndex.foreach { case (s, i) =>
      assert(s == (if (i % 2 == 0) "Male" else "Female"))
    }
  }

  test("durations are whole seconds (reference B5) and cumsum is end_sec (B7)") {
    val rows = gen.orderBy("phrase_id")
      .select("dur_sec", "end_sec", "start_sec").collect()
    var running = 0.0
    rows.foreach { r =>
      val (dur, end, start) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(dur == math.floor(dur) && dur >= 1.0, s"dur $dur not whole-second")
      assert(math.abs(start - running) < 1e-9)
      running += dur
      assert(math.abs(end - running) < 1e-9)
    }
  }

  test("pcm is non-silent and bounded") {
    val stats = gen.limit(2).select("pcm").as[Array[Byte]].collect().map { pcm =>
      val xs = graft.audio.Dsp.pcm16ToDoubles(pcm)
      (xs.map(math.abs).max, xs.map(math.abs).sum / xs.length)
    }
    stats.foreach { case (mx, meanAbs) =>
      assert(mx <= 1.0 && mx > 0.1, s"max amplitude $mx")
      assert(meanAbs > 0.01, "waveform is near-silent")
    }
  }
}
