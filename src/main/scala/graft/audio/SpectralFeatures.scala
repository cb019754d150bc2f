package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-frame spectral descriptors over STFT power spectra — the
  * standard librosa feature pack the reference's ecosystem ships next
  * to mel/MFCC (`librosa.feature.spectral_centroid` and friends;
  * the reference itself stops at mel,
  * `/root/reference/src/voice_classifier.py:82`):
  * spectral centroid, bandwidth, rolloff, flatness, plus time-domain
  * RMS energy and zero-crossing rate.
  *
  * Definitions (S = per-frame power spectrum, f_k = bin centre Hz):
  *   centroid  = Σ S_k·f_k / Σ S_k
  *   bandwidth = sqrt(Σ S_k·(f_k − centroid)² / Σ S_k)
  *   rolloff   = min f_r with  cumsum_k≤r(S) ≥ p·ΣS   (p = 0.85)
  *   flatness  = exp(mean ln max(S,ε)) / mean S       (ε = 1e-10)
  *   rms       = sqrt(Σ x_i² / n)   over the unwindowed frame
  *   zcr       = #{i : sign(x_i) ≠ sign(x_{i−1})} / (n − 1)
  *
  * Oracle discipline (the nq_mfcc dump pattern): the engine half —
  * framing, FFT, Σx², zero-crossing count — ships as dumped inputs;
  * every formula above is then re-run by DuckDB over bitwise-identical
  * doubles with sequential-order list ops (`list_dot_product`,
  * element-wise `list_transform`, ordered window cumsum), so round-6
  * comparison is exact, not tolerance-based. All sums here are written
  * as explicit left-to-right loops to mirror that order.
  *
  * Scale shape: a narrow per-clip flatMap (frames never cross rows —
  * same contract as [[MelSpectrogram]]), then codegen'd arithmetic;
  * no shuffle anywhere. Per-frame state is one nFft/2+1 array.
  */
object SpectralFeatures {

  /** PCM clips → one row per STFT frame carrying the power spectrum
    * and the time-domain partials the features need:
    * (id, frame_id, frame_time, ps ARRAY<DOUBLE>, sumsq, zc, n).
    * Framing convention matches [[MelSpectrogram]] (no centre padding;
    * frame f covers samples [f·hop, f·hop+nFft)). */
  def frameSpectra(clips: DataFrame, nFft: Int = 512, hop: Int = 256,
      idCol: String = "phrase_id", pcmCol: String = "pcm",
      startSecCol: String = "start_sec",
      sampleRateCol: String = "sample_rate"): DataFrame = {
    val s = clips.sparkSession
    import s.implicits._
    val rows = clips
      .select(col(idCol).cast("long"), col(startSecCol).cast("double"),
        col(pcmCol), col(sampleRateCol).cast("int"))
      .as[(Long, Double, Array[Byte], Int)]
    rows.mapPartitions { it =>
      var window: Array[Double] = null
      it.flatMap { case (id, startSec, pcm, sr) =>
        require(pcm != null, s"frameSpectra: null $pcmCol for id=$id")
        if (window == null) window = Dsp.hannWindow(nFft)
        val x = Dsp.pcm16ToDoubles(pcm)
        val nFrames = if (x.length >= nFft) (x.length - nFft) / hop + 1 else 0
        (0 until nFrames).iterator.map { fi =>
          val frame =
            java.util.Arrays.copyOfRange(x, fi * hop, fi * hop + nFft)
          val ps = Dsp.powerSpectrum(frame, window)
          var sumsq = 0.0
          var zc = 0L
          var i = 0
          while (i < nFft) {
            sumsq += frame(i) * frame(i)
            if (i > 0 && (frame(i) >= 0.0) != (frame(i - 1) >= 0.0)) zc += 1
            i += 1
          }
          (id, fi.toLong, startSec + fi.toDouble * hop / sr, ps, sumsq, zc,
            sr)
        }
      }
    }.toDF(idCol, "frame_id", "frame_time", "ps", "sumsq", "zc",
      "sample_rate")
  }

  /** Bin-centre frequencies f_k = k·sr/nFft for k = 0..nFft/2 — shipped
    * to the oracle as data (same role as [[Mfcc.dctBasis]]: the
    * engine-side arithmetic the SQL tail consumes verbatim). */
  def binFreqs(nFft: Int, sampleRate: Int): Seq[(Int, Double)] =
    (0 to nFft / 2).map(k => (k, k.toDouble * sampleRate / nFft))

  /** Append the six features to a [[frameSpectra]] relation. Pure
    * sequential-order arithmetic per row (see object doc); null/empty
    * spectra degrade to null features. */
  def withFeatures(frames: DataFrame, nFft: Int = 512,
      rollPct: Double = 0.85, floorP: Double = 1e-10): DataFrame = {
    val featUdf = udf { (ps: Seq[Double], sr: Int) =>
      if (ps == null || ps.isEmpty) null
      else {
        val n = ps.length
        // ΣS and ΣS·f as explicit left-to-right folds: the oracle's
        // list_dot_product walks the same order, so these doubles are
        // bitwise shared, not merely close
        var sumS = 0.0; var sumSf = 0.0
        var k = 0
        while (k < n) {
          val f = k.toDouble * sr / nFft
          sumS += ps(k); sumSf += ps(k) * f
          k += 1
        }
        val centroid = sumSf / sumS
        var sumDev = 0.0
        k = 0
        while (k < n) {
          val f = k.toDouble * sr / nFft
          sumDev += ps(k) * ((f - centroid) * (f - centroid))
          k += 1
        }
        val bandwidth = math.sqrt(sumDev / sumS)
        // rolloff: first bin whose running cumsum reaches p·ΣS
        val thr = rollPct * sumS
        var cum = 0.0; var roll = 0.0
        k = 0
        var found = false
        while (k < n && !found) {
          cum += ps(k)
          if (cum >= thr) { roll = k.toDouble * sr / nFft; found = true }
          k += 1
        }
        var sumLn = 0.0
        k = 0
        while (k < n) { sumLn += math.log(math.max(ps(k), floorP)); k += 1 }
        val flatness = math.exp(sumLn / n) / (sumS / n)
        (centroid, bandwidth, roll, flatness)
      }
    }
    frames
      .withColumn("_f", featUdf(col("ps"), col("sample_rate")))
      .withColumn("centroid", col("_f._1"))
      .withColumn("bandwidth", col("_f._2"))
      .withColumn("rolloff", col("_f._3"))
      .withColumn("flatness", col("_f._4"))
      .drop("_f")
      // rms/zcr are codegen'd column arithmetic — the time-domain
      // partials (Σx², crossing count) rode along from the framing map
      .withColumn("rms", sqrt(col("sumsq") / lit(nFft.toDouble)))
      .withColumn("zcr", col("zc").cast("double") / lit(nFft - 1.0))
  }
}
