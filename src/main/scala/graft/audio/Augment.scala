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
      // rms = sqrt(Σx²/n); silent clips (rms 0) pass through unscaled
      .withColumn("rms", sqrt(col("sumsq") / col("n_samples")))
      .withColumn("gain",
        when(col("rms") > 0.0, lit(targetRms) / col("rms"))
          .otherwise(lit(1.0)))
      .withColumn(pcmCol, scale(col(pcmCol), col("gain")))
      .drop("_m")
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
