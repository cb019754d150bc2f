package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Waveform augmentation for audio training corpora — the standard
  * recipe tier (Ko et al. 2015 "Audio augmentation for speech
  * recognition" for speed perturbation; loudness normalization and
  * deterministic time shift as the classic companions), extending the
  * reference's feature path the same way [[SpecAugment]] does on the
  * spectrogram side.
  *
  * Everything is a narrow per-clip map — no shuffle, no state, no
  * driver-side randomness (shifts draw from `xxhash64`, the seeded
  * column-arithmetic discipline of the G2/G3 split/shuffle family) —
  * so the whole module scales as embarrassingly parallel decode work,
  * exactly like the PCM sources it feeds.
  */
object Augment {

  /** Speed perturbation: for each factor α the signal is windowed-sinc
    * resampled ([[Src.resample]]) from `sr` to round(sr/α) and
    * RELABELED `sr` — sox's `speed α`, the Kaldi 3-way recipe. Duration
    * scales by 1/α; pitch and formants scale by α (spec-pinned via the
    * [[SpectralFeatures]] centroid of a perturbed tone). α = 1 is the
    * identity (bit-exact passthrough). Output: one row per
    * (clip, factor), pcm re-encoded PCM16LE, plus the perturbed
    * `n_samples`. */
  def speedPerturb(clips: DataFrame,
      factors: Seq[Double] = Seq(0.9, 1.0, 1.1),
      idCol: String = "phrase_id", pcmCol: String = "pcm",
      sampleRateCol: String = "sample_rate"): DataFrame = {
    require(factors.nonEmpty && factors.forall(f => f > 0.5 && f < 2.0),
      s"speed factors out of the sane (0.5, 2) band: $factors")
    val perturb = udf { (pcm: Array[Byte], sr: Int, alpha: Double) =>
      if (alpha == 1.0) pcm
      else Src.resamplePcm16(pcm, sr, math.round(sr / alpha).toInt)
    }
    clips
      .withColumn("speed", explode(typedLit(factors)))
      .withColumn(pcmCol,
        perturb(col(pcmCol), col(sampleRateCol).cast("int"), col("speed")))
      .withColumn("n_samples", (length(col(pcmCol)) / 2).cast("long"))
  }

  /** Loudness (RMS) normalization: per clip, gain = targetRms / rms,
    * applied sample-wise with int16 saturation. Two narrow passes over
    * the clip's own bytes (measure, scale) — per-row work, no
    * aggregate exchange. Appends `rms` (pre-gain) and `gain`. */
  def rmsNormalize(clips: DataFrame, targetRms: Double = 0.1,
      pcmCol: String = "pcm"): DataFrame = {
    require(targetRms > 0.0 && targetRms <= 1.0,
      s"targetRms must be in (0, 1]: $targetRms")
    val measure = udf { pcm: Array[Byte] =>
      val x = Dsp.pcm16ToDoubles(pcm)
      var ss = 0.0
      var i = 0
      while (i < x.length) { ss += x(i) * x(i); i += 1 }
      (ss, x.length.toLong)
    }
    val scale = udf { (pcm: Array[Byte], gain: Double) =>
      val x = Dsp.pcm16ToDoubles(pcm)
      val out = new Array[Byte](pcm.length)
      var i = 0
      while (i < x.length) {
        val s = math.max(-32768.0, math.min(32767.0,
          math.rint(x(i) * gain * 32767.0))).toInt
        out(2 * i) = (s & 0xff).toByte
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    clips
      .withColumn("_m", measure(col(pcmCol)))
      // the measured moments stay as columns (sumsq, n_samples): they
      // are the dumped inputs the nq_rms_normalize oracle re-derives
      // rms/gain from — and useful lineage for any downstream audit
      .withColumn("sumsq", col("_m._1"))
      .withColumn("n_samples", col("_m._2"))
      // rms = sqrt(Σx²/n); silent clips (rms 0) pass through unscaled,
      // and an EMPTY clip (n = 0) takes the same passthrough branch
      // via the guard — under ANSI mode the unguarded 0/0 would throw
      .withColumn("rms", when(col("n_samples") > 0,
        sqrt(col("sumsq") / col("n_samples"))).otherwise(lit(0.0)))
      .withColumn("gain",
        when(col("rms") > 0.0, lit(targetRms) / col("rms"))
          .otherwise(lit(1.0)))
      .withColumn(pcmCol, scale(col(pcmCol), col("gain")))
      .drop("_m")
  }

  /** Deterministic synthetic noise corpus (splitmix64 stream per
    * noise_id) — the stand-in for a MUSAN-style noise table in specs
    * and contract queries. Generation is a narrow map over a range:
    * deterministic under any partitioning. */
  def syntheticNoise(s: SparkSession, k: Int, sec: Double, sr: Int,
      seed: Long = 0x9e3779b97f4a7c15L): DataFrame = {
    val gen = udf { id: Long =>
      val n = (sec * sr).toInt
      val out = new Array[Byte](n * 2)
      var st = seed * (id + 1)
      var i = 0
      while (i < n) {
        st += 0x9e3779b97f4a7c15L
        var z = st
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        // ~[-0.25, 0.25] noise in int16
        val sv = (z >> 48).toInt / 4
        out(2 * i) = (sv & 0xff).toByte
        out(2 * i + 1) = ((sv >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    s.range(k).select(col("id").as("noise_id"),
      gen(col("id")).as("pcm"), lit(sr).as("sample_rate"))
  }

  /** Mix each clip with a seeded pick from a bounded noise table at a
    * target signal-to-noise ratio (the MUSAN-recipe augmentation,
    * Snyder 2015): gain g scales the noise so rms(x)²/rms(g·n)² =
    * 10^(snrDb/10); the noise loops to the clip's length; output
    * samples are floor(v·32768 + 0.5) with int16 saturation.
    *
    * Scale shape: the noise table is bounded (thousands of clips) so
    * the pair join BROADCASTS it; the pick is `xxhash64(seed, id) mod
    * k` column arithmetic; everything else is a narrow per-clip
    * kernel. One corpus scan, zero shuffles.
    *
    * Oracle discipline: sample decode (s/32768) and re-encode
    * (·32768) are power-of-two EXACT, and g's derivation + the
    * per-sample `x + g·n` tree are shared-order IEEE — so DuckDB
    * recomputes the entire mix bit-for-bit from dumped int16 samples
    * and moments; there is no float tolerance anywhere.
    *
    * `noise` must carry a contiguous `noise_id` in [0, k) (as
    * [[syntheticNoise]] produces). Appends noise_id, gain, n_samples
    * and replaces `pcmCol` with the mixture. */
  def mixAtSnr(clips: DataFrame, noise: DataFrame, snrDb: Double = 10.0,
      seed: Long = 7L, idCol: String = "phrase_id",
      pcmCol: String = "pcm"): DataFrame = {
    val measure = udf { pcm: Array[Byte] =>
      val x = Dsp.pcm16ToDoubles(pcm)
      var ss = 0.0
      var i = 0
      while (i < x.length) { ss += x(i) * x(i); i += 1 }
      (ss, x.length.toLong)
    }
    val mixK = udf { (xp: Array[Byte], np: Array[Byte], g: Double) =>
      val nx = xp.length / 2
      val nn = np.length / 2
      val out = new Array[Byte](xp.length)
      var i = 0
      while (i < nx) {
        val sx = ((xp(2 * i + 1).toInt << 8) | (xp(2 * i) & 0xff)).toShort
        val j = i % nn
        val sn = ((np(2 * j + 1).toInt << 8) | (np(2 * j) & 0xff)).toShort
        // every op here is shared-order with the oracle SQL; /32768
        // and ·32768 are exact, so the only roundings are g·n, the
        // add, and the +0.5
        val v = sx / 32768.0 + g * (sn / 32768.0)
        val s = math.max(-32768.0,
          math.min(32767.0, math.floor(v * 32768.0 + 0.5))).toInt
        out(2 * i) = (s & 0xff).toByte
        out(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    val k = noise.groupBy().agg(count(lit(1)).as("n_noise"))
    val nz = noise.select(col("noise_id"), col(pcmCol).as("_npcm"))
      .withColumn("_nm", measure(col("_npcm")))
      .withColumn("sumsq_n", col("_nm._1"))
      .withColumn("nn", col("_nm._2"))
      .drop("_nm")
    clips
      .crossJoin(broadcast(k))
      .withColumn("noise_id",
        pmod(xxhash64(lit(seed), col(idCol)), col("n_noise")))
      .join(broadcast(nz), "noise_id")
      .withColumn("_m", measure(col(pcmCol)))
      .withColumn("sumsq_x", col("_m._1"))
      .withColumn("n_samples", col("_m._2"))
      // g = sqrt( (Σx²/nx) / ((Σn²/nn) · 10^(snr/10)) ) — ONE shared
      // tree; silent noise degrades to g = 0 (pure passthrough), and
      // an empty clip (nx = 0) must take the same branch: ANSI mode
      // throws on the 0/0 the unguarded tree would evaluate
      .withColumn("gain",
        when(col("sumsq_n") > 0.0 && col("n_samples") > 0,
          sqrt((col("sumsq_x") / col("n_samples")) /
            ((col("sumsq_n") / col("nn")) *
              pow(lit(10.0), lit(snrDb / 10.0)))))
          .otherwise(lit(0.0)))
      .withColumn(pcmCol, mixK(col(pcmCol), col("_npcm"), col("gain")))
      .drop("_m", "_npcm", "n_noise")
  }

  /** Deterministic time shift: each clip is delayed by a seeded number
    * of samples in [0, maxShift·sr), zero-padded at the front and
    * truncated at the tail (length-preserving — the batch-shape
    * invariant training loaders want). The draw is `xxhash64(seed, id)`
    * column arithmetic; the byte move is a single arraycopy. */
  def timeShift(clips: DataFrame, seed: Long, maxShiftSec: Double = 0.1,
      idCol: String = "phrase_id", pcmCol: String = "pcm",
      sampleRateCol: String = "sample_rate"): DataFrame = {
    require(maxShiftSec > 0.0, s"maxShiftSec must be positive")
    val move = udf { (pcm: Array[Byte], shiftSamples: Int) =>
      val b = shiftSamples * 2
      if (b == 0 || b >= pcm.length) new Array[Byte](pcm.length)
      else {
        val out = new Array[Byte](pcm.length)
        System.arraycopy(pcm, 0, out, b, pcm.length - b)
        out
      }
    }
    clips
      .withColumn("shift_samples",
        pmod(xxhash64(lit(seed), col(idCol)),
          (lit(maxShiftSec) * col(sampleRateCol)).cast("long"))
          .cast("int"))
      .withColumn(pcmCol, move(col(pcmCol), col("shift_samples")))
  }
}
