package graft.audio

import graft.SparkSpec

/** Audio fingerprint dedup: gain-halved copies are hamming-0 twins
  * (the fingerprint's defining scale invariance), small mutes stay
  * within a couple of bits, and the fingerprint is deterministic.
  * Incidental pairs between DISTINCT clips are expected here — the
  * synth corpus reuses phrase patterns, so some clips genuinely share
  * spectral envelopes — hence the spec pins planted-pair RECOVERY,
  * not pair-set equality (unlike the image corpus, whose noise blocks
  * make unrelated collisions impossible).
  */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted recovery: half-gain copies at hamming 0, mutes within " +
      "2 bits, every planted pair found") {
    val pairs = AudioDedup.nqAudioNeardup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    (0L until 40L).foreach { id =>
      if (id % 5 == 0) {
        val h = pairs.get((id, id + 1000000L))
        assert(h === Some(0L),
          s"gain copy of $id must be a hamming-0 twin, got $h")
      } else if (id % 5 == 3) {
        val h = pairs.get((id, id + 2000000L))
        assert(h.exists(_ <= 2L),
          s"muted copy of $id must stay within 2 bits, got $h")
      }
    }
  }

  test("fingerprint is deterministic and gain-invariant by construction") {
    val pcm = graft.gen.VoiceDataGen.synthPcm("alpha beta gamma", true)
    val g = AudioDedup.energyGrid(pcm)
    assert(AudioDedup.fingerprint(g) ===
      AudioDedup.fingerprint(AudioDedup.energyGrid(pcm)))
    // an EXACT double-domain gain leaves every bit untouched
    val scaled = g.map(_ * 0.25)
    assert(AudioDedup.fingerprint(scaled) === AudioDedup.fingerprint(g))
  }
}
