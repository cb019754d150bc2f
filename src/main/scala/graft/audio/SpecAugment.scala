package graft.audio

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SpecAugment-style masking (Park et al. 2019, "SpecAugment: A Simple
  * Data Augmentation Method for ASR") over the engine's frame×mel
  * relation — the training-data augmentation tier of the reference's
  * feature path: zero out `nTimeMasks` random frame ranges and
  * `nFreqMasks` random mel-bin ranges per clip, deterministically from
  * a seed (reproducible epochs, the same discipline as the G2/G3
  * seeded split/shuffle family).
  *
  * Spark-first: mask drawing is pure column arithmetic —
  * `xxhash64(seed, clip, role, idx)` modulo the legal range, over ONE
  * per-clip aggregate (max frame id) — and application is a join plus
  * a codegen'd range predicate. No UDF, no driver-side randomness, no
  * collect: at 100 TB the mask table is clip-count-sized and flows
  * through a normal equi-join (AQE broadcasts it when small).
  *
  * Oracle discipline: the drawn masks are DATA (dumped beside the
  * pre-mask values); DuckDB re-applies the range predicate and the
  * zeroing CASE over bitwise-identical inputs — an exact hash oracle
  * with no float tolerance at all.
  */
object SpecAugment {

  /** Draw masks for each clip in `frames` (a [[MelSpectrogram]]-shaped
    * relation: idCol, frame_id, …). Returns one row per mask:
    * (idCol, kind 't'|'f', start, width) — time masks index frame_id,
    * frequency masks index the mel bin 0..nBins−1. Widths are
    * 1..maxT/maxF clamped to the clip's extent; starts keep the mask
    * fully inside it. */
  def drawMasks(frames: DataFrame, nBins: Int, seed: Long,
      nTimeMasks: Int = 2, nFreqMasks: Int = 2,
      maxT: Int = 12, maxF: Int = 4,
      idCol: String = "phrase_id"): DataFrame = {
    val perClip = frames.groupBy(col(idCol))
      .agg((max(col("frame_id")) + 1L).as("n_frames"))
    def drawn(kind: String, n: Int, extent: org.apache.spark.sql.Column,
        maxW: Int) = {
      val idx = explode(sequence(lit(0), lit(n - 1))).as("mask_idx")
      val base = perClip.select(col(idCol), col("n_frames"), idx)
      val w = lit(1) +
        pmod(xxhash64(lit(seed), col(idCol), lit(kind + "_w"),
          col("mask_idx")), least(lit(maxW.toLong), extent)).cast("int")
      val start =
        pmod(xxhash64(lit(seed), col(idCol), lit(kind + "_s"),
          col("mask_idx")), extent - w + 1L).cast("int")
      base.select(col(idCol), lit(kind).as("kind"),
        start.as("start"), w.as("width"))
    }
    drawn("t", nTimeMasks, col("n_frames"), maxT)
      .unionAll(drawn("f", nFreqMasks, lit(nBins.toLong), maxF))
  }

  /** Apply `masks` to an exploded (idCol, frame_id, k, `valueCol`)
    * relation: value → 0.0 inside any of the clip's mask ranges.
    * The join key is the clip id; the per-clip mask list is tiny
    * (nTimeMasks + nFreqMasks), carried as two small struct arrays. */
  def applyMasks(exploded: DataFrame, masks: DataFrame,
      valueCol: String = "v", idCol: String = "phrase_id"): DataFrame = {
    val packed = masks.groupBy(col(idCol)).agg(
      collect_list(when(col("kind") === "t",
        struct(col("start"), col("width")))).as("_tm"),
      collect_list(when(col("kind") === "f",
        struct(col("start"), col("width")))).as("_fm"))
    val hitT = exists(col("_tm"), m =>
      col("frame_id") >= m("start") &&
        col("frame_id") < m("start") + m("width"))
    val hitF = exists(col("_fm"), m =>
      col("k") >= m("start") && col("k") < m("start") + m("width"))
    exploded.join(packed, Seq(idCol), "left")
      .withColumn(valueCol,
        when(coalesce(hitT, lit(false)) || coalesce(hitF, lit(false)),
          lit(0.0)).otherwise(col(valueCol)))
      .drop("_tm", "_fm")
  }
}
