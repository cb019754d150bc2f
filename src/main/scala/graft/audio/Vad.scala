package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Energy-based voice activity detection — `librosa.effects.split` /
  * `librosa.effects.trim` semantics (the silence-removal step audio
  * training pipelines run before feature extraction; the reference's
  * ecosystem tier past `voice_classifier.py:82`'s mel step): a frame is
  * VOICED iff its RMS is within `topDb` of the clip's peak frame RMS
  *
  *   rms_f > maxRms_clip · 10^(−topDb/20)
  *
  * and maximal runs of voiced frames become segments (gaps-and-islands
  * over the frame index). Segment sample bounds follow librosa's
  * interval convention: [start_frame·hop, end_frame·hop + nFft).
  *
  * Spark-first shape: per-frame energies come from
  * [[SpectralFeatures.frameSpectra]]'s narrow per-clip flatMap; the
  * clip-peak reference is ONE clip-keyed window max; the island id is
  * `frame_id − row_number` over voiced frames (no UDF, no state); the
  * segment is a clip-keyed aggregate. Two exchanges on the clip key
  * total (window + groupBy share the partitioning — Spark reuses the
  * exchange), each carrying one double per frame, not audio bytes.
  * At 100 TB the clip key is high-cardinality and evenly sized.
  *
  * Oracle discipline: everything past the dumped (clip, frame_id,
  * sumsq) relation is shared-order IEEE arithmetic + integer island
  * bookkeeping, so DuckDB re-runs the identical SQL over bitwise
  * doubles — `10^(−topDb/20)` stays one shared `pow` call, and the
  * strict `>` compare sees the same bits on both engines.
  */
object Vad {

  /** Segment a [[SpectralFeatures.frameSpectra]]-shaped relation
    * (idCol, frame_id, sumsq, sample_rate, …) into voiced intervals.
    * Returns one row per segment: (idCol, seg_id, start_frame,
    * end_frame inclusive, n_frames, start_sample, end_sample exclusive,
    * start_sec, dur_sec, peak_rms). Fully-silent clips yield no rows —
    * callers wanting trim semantics keep segment 0's bounds. */
  def segments(frames: DataFrame, nFft: Int = 512, hop: Int = 256,
      topDb: Double = 30.0, idCol: String = "phrase_id"): DataFrame = {
    require(topDb > 0.0, s"topDb must be positive, got $topDb")
    val byClip = Window.partitionBy(col(idCol))
    val rms = sqrt(col("sumsq") / lit(nFft.toDouble))
    val voiced = frames
      .withColumn("rms", rms)
      .withColumn("max_rms", max(col("rms")).over(byClip))
      // the threshold is ONE shared expression tree: maxRms · 10^(−topDb/20)
      .filter(col("rms") >
        col("max_rms") * pow(lit(10.0), lit(-topDb / 20.0)))
    val island = voiced
      .withColumn("_rn", row_number().over(
        byClip.orderBy(col("frame_id"))))
      .withColumn("_isl", col("frame_id") - col("_rn"))
    island.groupBy(col(idCol), col("_isl"))
      .agg(
        min("frame_id").as("start_frame"),
        max("frame_id").as("end_frame"),
        count(lit(1)).as("n_frames"),
        max("rms").as("peak_rms"),
        min("sample_rate").as("_sr"))
      .withColumn("seg_id",
        row_number().over(byClip.orderBy(col("start_frame"))) - 1)
      .withColumn("start_sample", col("start_frame") * hop)
      .withColumn("end_sample", col("end_frame") * hop + nFft)
      .withColumn("start_sec",
        col("start_frame").cast("double") * hop / col("_sr"))
      .withColumn("dur_sec",
        (col("end_sample") - col("start_sample")).cast("double") / col("_sr"))
      .select(col(idCol), col("seg_id"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("start_sample"),
        col("end_sample"), col("start_sec"), col("dur_sec"),
        col("peak_rms"))
  }
}
