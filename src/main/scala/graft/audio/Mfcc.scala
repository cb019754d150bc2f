package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MFCC over [[MelSpectrogram]]'s frame output — the classic compact
  * audio feature (log-mel energies decorrelated by an orthonormal
  * DCT-II, librosa's `mfcc` convention): per frame,
  * `mfcc = dct2(ln(max(mel, eps)))[0 until nMfcc]`. Extends the
  * engine's I1 feature path (the reference consumes mel directly,
  * `/root/reference/src/voice_classifier.py:82`; MFCC is the standard
  * next step its ecosystem — librosa — ships alongside).
  *
  * Scale shape: a narrow per-row typed map over the already-framed mel
  * relation — no shuffle, no state; nMels ≤ dozens keeps the O(nMels²)
  * DCT negligible next to the FFT that produced the frame.
  */
object Mfcc {

  /** Add an `mfcc` column to a (… , mel ARRAY<DOUBLE>) frame relation.
    * `floorP` clamps empty mel bands before the log (same guard role as
    * lmScore's unseen-bigram floor). */
  def withMfcc(melFrames: DataFrame, nMfcc: Int = 13,
      melCol: String = "mel", floorP: Double = 1e-10): DataFrame = {
    require(nMfcc > 0, s"nMfcc must be positive, got $nMfcc")
    val fn = udf { mel: Seq[Double] =>
      // null/empty in → null out (SQL convention): one malformed frame
      // row must degrade to a null feature, not fail the whole job
      // (dct2 requires a non-empty input)
      if (mel == null || mel.isEmpty) null
      else Dsp.dct2(mel.map(v => math.log(math.max(v, floorP))).toArray,
        math.min(nMfcc, mel.length))
    }
    // a UDF (not a per-element higher-order expression): the DCT reads
    // EVERY input element per output coefficient — as a transform()
    // lambda it would re-evaluate the log-mel array per k. The per-row
    // array in/array out call is the same boundary the typed
    // MelSpectrogram map already sets for this family.
    melFrames.withColumn("mfcc", fn(col(melCol)))
  }

  /** The DCT-II basis [[Dsp.dct2]] evaluates, as data: row k carries the
    * UNSCALED cosine vector and its orthonormal scale factor, computed
    * with the exact `math.cos`/`math.sqrt` calls (and operand order)
    * dct2 uses. Dumped for the DuckDB oracle: the transcendentals are
    * the engine-specific half (JVM libm), so they ship as inputs — the
    * oracle then re-runs the O(n·k) multiply-accumulate tail
    * (`list_dot_product`, the same sequential sum as dct2's loop) over
    * identical doubles, the dumped-model pattern the ANN/GK promotions
    * set. */
  def dctBasis(n: Int, nMfcc: Int): Seq[(Int, Seq[Double], Double)] =
    (0 until nMfcc).map { k =>
      val c = (0 until n).map(i => math.cos(math.Pi * (i + 0.5) * k / n))
      (k, c, if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n))
    }

  /** The log-mel vector the DCT consumes, with the UDF's exact
    * per-element arithmetic (`math.log(math.max(v, floorP))`) — dumped
    * alongside [[dctBasis]] so the oracle's inputs are bitwise the
    * UDF's intermediates. */
  def logMelUdf(floorP: Double = 1e-10) =
    org.apache.spark.sql.functions.udf { mel: Seq[Double] =>
      if (mel == null) null
      else mel.map(v => math.log(math.max(v, floorP)))
    }
}
