package graft.audio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the round-11 audio feature pack —
  * spectral descriptors ([[SpectralFeatures]]), delta features
  * ([[Delta]]) and SpecAugment masking ([[SpecAugment]]) over the
  * seeded voice corpus — each hard-oracled with the nq_mfcc dump
  * pattern: the engine half (framing, FFT, transcendental per-element
  * maps, mask drawing) ships as dumped inputs, and DuckDB re-runs the
  * SQL-expressible tail with sequential-order list ops / identical
  * window arithmetic over bitwise-identical doubles.
  */
object FeatureQueries {

  private val Dir = "/tmp/graft_audio_oracle"
  private val NFft = 512
  private val Hop = 256
  private val NBins = NFft / 2 + 1 // 257
  private val NMels = 20
  private val NMfcc = 13
  private val MaskSeed = 11L
  private val DeletedClip = 3L

  private def clips(s: SparkSession) =
    graft.gen.VoiceDataGen
      .generate(s, graft.ml.VoicePipeline.NPhrases,
        graft.ml.VoicePipeline.Seed)
      .drop("speaker")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Six spectral descriptors per STFT frame. Dumps: the power
    // spectra (+ time-domain partials) and the bin-frequency vector;
    // the oracle re-derives every feature from those.
    "nq_spectral" -> ((s: SparkSession, _: String) => {
      val frames = SpectralFeatures.frameSpectra(clips(s), NFft, Hop)
      if (graft.OracleDump.enabled) {
        import s.implicits._
        graft.OracleDump.dump(frames, s"$Dir/spectral_ps.parquet")
        graft.OracleDump.dump(
          SpectralFeatures.binFreqs(NFft, graft.gen.VoiceDataGen.SampleRate)
            .map { case (k, f) => (k, f, 1.0) }.toDF("k", "freq", "one"),
          s"$Dir/spectral_bins.parquet")
      }
      SpectralFeatures.withFeatures(frames, NFft)
        .select(col("phrase_id"), col("frame_id"),
          round(col("frame_time"), 6).as("frame_time"),
          round(col("centroid"), 6).as("centroid"),
          round(col("bandwidth"), 6).as("bandwidth"),
          round(col("rolloff"), 6).as("rolloff"),
          round(col("flatness"), 6).as("flatness"),
          round(col("rms"), 6).as("rms"),
          round(col("zcr"), 6).as("zcr"))
        .orderBy("phrase_id", "frame_id")
    }),
    // MFCC Δ and Δ² tracks — pure window arithmetic on both engines
    // (no UDF past the dumped DCT inputs), librosa's delta convention
    // with edge replication.
    "nq_mfcc_delta" -> ((s: SparkSession, _: String) => {
      val mel = new MelSpectrogram().transform(clips(s))
      if (graft.OracleDump.enabled) {
        import s.implicits._
        graft.OracleDump.dump(
          mel.select(col("phrase_id"), col("frame_id"),
            Mfcc.logMelUdf()(col("mel")).as("v")),
          s"$Dir/delta_logmel.parquet")
        graft.OracleDump.dump(
          Mfcc.dctBasis(NMels, NMfcc).toDF("k", "basis", "scale"),
          s"$Dir/delta_basis.parquet")
      }
      val c = Mfcc.withMfcc(mel)
        .select(col("phrase_id"), col("frame_id"),
          posexplode(col("mfcc")).as(Seq("k", "c")))
      val d2 = Delta.withDelta(
        Delta.withDelta(c, "c", "dv", Seq("phrase_id", "k"), "frame_id"),
        "dv", "dv2", Seq("phrase_id", "k"), "frame_id")
      d2.select(col("phrase_id"), col("frame_id"), col("k"),
          round(col("c"), 6).as("mfcc"),
          round(col("dv"), 6).as("delta"),
          round(col("dv2"), 6).as("delta2"))
        .orderBy("phrase_id", "frame_id", "k")
    }),
    // The audio feature store (streaming ingest surface): two fenced
    // batch writes + one key-level delete, then a per-clip aggregate
    // over the STORE READ. The oracle re-aggregates the union of the
    // dumped raw batch files with the deleted clip excluded by
    // literal filter — store-read ≡ (union of batch writes) minus
    // tombstones, hash-checked. Feature VALUES are already
    // hard-checked by nq_spectral; this entry judges the store
    // plumbing (merge + tombstone semantics).
    "nq_audio_store" -> ((s: SparkSession, _: String) => {
      import graft.streaming.StreamingOps
      val store = "/tmp/graft_audio_store"
      val p = new org.apache.hadoop.fs.Path(store)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // deterministic rebuild per invocation
      val cl = clips(s).withColumnRenamed("phrase_id", "clip_id")
      StreamingOps.applyAudioFeatureBatch(
        cl.filter(pmod(col("clip_id"), lit(2)) === 0), 0L, store,
        NFft, Hop)
      StreamingOps.applyAudioFeatureBatch(
        cl.filter(pmod(col("clip_id"), lit(2)) === 1), 1L, store,
        NFft, Hop)
      StreamingOps.deleteFromFeatureStore(
        { import s.implicits._; Seq(DeletedClip).toDF("clip_id") },
        store, batchId = 0L)
      if (graft.OracleDump.enabled) {
        graft.OracleDump.dump(s.read.parquet(s"$store/batch-0.parquet"),
          s"$Dir/store_b0.parquet")
        graft.OracleDump.dump(s.read.parquet(s"$store/batch-1.parquet"),
          s"$Dir/store_b1.parquet")
      }
      StreamingOps.audioFeaturesFromStore(s, store)
        .groupBy("clip_id")
        .agg(count(lit(1)).as("n_frames"), sum("zc").as("sum_zc"),
          round(min("centroid"), 6).as("min_centroid"),
          round(max("bandwidth"), 6).as("max_bandwidth"))
        .orderBy("clip_id")
    }),
    // Speed perturbation (Ko 2015) over the voice corpus at α ∈
    // {0.9, 1.1} (α = 1 is the spec-pinned bit-exact identity):
    // per-(clip, α) integer aggregates over micro-quantized perturbed
    // samples — the nq_audio_resample oracle pattern verbatim (the
    // windowed-sinc half ships as dumped BIGINTs; DuckDB re-runs the
    // count/DC/energy tail in exact integer arithmetic).
    "nq_speed_perturb" -> ((s: SparkSession, _: String) => {
      val perturbed = Augment.speedPerturb(clips(s), Seq(0.9, 1.1))
      val y6 = udf { pcm: Array[Byte] =>
        Dsp.pcm16ToDoubles(pcm).map(v => math.rint(v * 1e6).toLong)
      }
      val ys = perturbed.select(col("phrase_id"), col("speed"),
        col("n_samples"), y6(col("pcm")).as("y6"))
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(
          ys.select(col("phrase_id"), col("speed"),
            explode(col("y6")).as("y6")),
          s"$Dir/perturbed.parquet")
      ys.select(col("phrase_id"), col("speed"),
          explode(col("y6")).as("y6"))
        .groupBy("phrase_id", "speed")
        .agg(count(lit(1)).as("n_out"), sum("y6").as("dc6"),
          sum(col("y6") * col("y6")).as("energy6"))
        .orderBy("phrase_id", "speed")
    }),
    // Phase-vocoder pitch shift at ±3 semitones (0 is the spec-pinned
    // bit-exact identity): per-(clip, steps) integer aggregates over
    // micro-quantized shifted samples — the nq_speed_perturb oracle
    // pattern (the vocoder+resample half ships as dumped BIGINTs;
    // DuckDB re-runs the count/DC/energy tail exactly).
    "nq_pitch_shift" -> ((s: SparkSession, _: String) => {
      val shifted = PhaseVocoder.pitchShift(clips(s), Seq(-3, 3))
      val y6 = udf { pcm: Array[Byte] =>
        Dsp.pcm16ToDoubles(pcm).map(v => math.rint(v * 1e6).toLong)
      }
      val ys = shifted.select(col("phrase_id"), col("steps"),
          y6(col("pcm")).as("y6"))
        .select(col("phrase_id"), col("steps"),
          explode(col("y6")).as("y6"))
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(ys, s"$Dir/pitched.parquet")
      ys.groupBy("phrase_id", "steps")
        .agg(count(lit(1)).as("n_out"), sum("y6").as("dc6"),
          sum(col("y6") * col("y6")).as("energy6"))
        .orderBy("phrase_id", "steps")
    }),
    // Griffin-Lim phase reconstruction from magnitude-only STFTs
    // (8 iterations, zero phase init — fully deterministic): the
    // dumped-BIGINT pattern again — micro-quantized reconstructed
    // samples ship as data, DuckDB re-runs the integer aggregate tail.
    "nq_griffinlim" -> ((s: SparkSession, _: String) => {
      val rec = GriffinLim.invertClips(clips(s), NFft, Hop, nIter = 8)
      val y6 = udf { pcm: Array[Byte] =>
        Dsp.pcm16ToDoubles(pcm).map(v => math.rint(v * 1e6).toLong)
      }
      val ys = rec.select(col("phrase_id"), y6(col("pcm")).as("y6"))
        .select(col("phrase_id"), explode(col("y6")).as("y6"))
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(ys, s"$Dir/griffinlim.parquet")
      ys.groupBy("phrase_id")
        .agg(count(lit(1)).as("n_out"), sum("y6").as("dc6"),
          sum(col("y6") * col("y6")).as("energy6"))
        .orderBy("phrase_id")
    }),
    // Full mel round trip: PCM → 20-band mel → NNLS → Griffin-Lim →
    // PCM (librosa mel_to_audio). Same dumped-BIGINT oracle tail.
    // The generated phrases run ~3.5 min each; the contract entry
    // inverts the first 5 s of every clip — the kernel is per-sample
    // linear, so the slice pins it as hard as the full clip at 1/40th
    // the Verify cost (full-length behavior is spec territory).
    "nq_mel_invert" -> ((s: SparkSession, _: String) => {
      val sliced = clips(s).withColumn("pcm",
        expr(s"substring(pcm, 1, ${5 * 22050 * 2})"))
      val rec = MelInvert.roundTripClips(sliced, NMels, NFft, Hop)
      val y6 = udf { pcm: Array[Byte] =>
        Dsp.pcm16ToDoubles(pcm).map(v => math.rint(v * 1e6).toLong)
      }
      val ys = rec.select(col("phrase_id"), y6(col("pcm")).as("y6"))
        .select(col("phrase_id"), explode(col("y6")).as("y6"))
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(ys, s"$Dir/melinvert.parquet")
      ys.groupBy("phrase_id")
        .agg(count(lit(1)).as("n_out"), sum("y6").as("dc6"),
          sum(col("y6") * col("y6")).as("energy6"))
        .orderBy("phrase_id")
    }),
    // SNR-targeted noise mixing (MUSAN recipe): seeded pick from a
    // bounded noise table, broadcast pair join, loop + scale + add.
    // The oracle recomputes the ENTIRE mix bit-for-bit from dumped
    // int16 samples + moments (decode/encode are power-of-two exact;
    // the gain and per-sample trees are shared-order IEEE), then
    // compares exact integer aggregates of the mixture.
    "nq_mix_snr" -> ((s: SparkSession, _: String) => {
      val cl = clips(s)
      val noise = Augment.syntheticNoise(s, 3, 1.0,
        graft.gen.VoiceDataGen.SampleRate)
      val s16 = udf { pcm: Array[Byte] =>
        Array.tabulate(pcm.length / 2)(i =>
          (((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)).toShort)
            .toInt)
      }
      val mixed = Augment.mixAtSnr(cl, noise, snrDb = 10.0, seed = 7L)
      if (graft.OracleDump.enabled) {
        graft.OracleDump.dump(
          cl.select(col("phrase_id"),
            posexplode(s16(col("pcm"))).as(Seq("i", "sv"))),
          s"$Dir/mix_clip_samples.parquet")
        graft.OracleDump.dump(
          noise.select(col("noise_id"),
            posexplode(s16(col("pcm"))).as(Seq("i", "sv"))),
          s"$Dir/mix_noise_samples.parquet")
        graft.OracleDump.dump(
          mixed.select(col("phrase_id"), col("noise_id"),
            col("sumsq_x"), col("n_samples").as("nx"),
            col("sumsq_n"), col("nn")),
          s"$Dir/mix_pairs.parquet")
      }
      val stats = udf { pcm: Array[Byte] =>
        val n = pcm.length / 2
        var dc = 0L
        var en = 0L
        var i = 0
        while (i < n) {
          val sv: Long =
            (((pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff)).toShort)
              .toLong
          dc += sv; en += sv * sv
          i += 1
        }
        (dc, en)
      }
      mixed
        .withColumn("_st", stats(col("pcm")))
        .select(col("phrase_id"), col("noise_id"),
          round(col("gain"), 6).as("gain"), col("n_samples"),
          col("_st._1").as("dc"), col("_st._2").as("energy"))
        .orderBy("phrase_id")
    }),
    // RMS loudness normalization: the measured Σx²/n ships as the
    // dumped input; DuckDB re-runs the rms/gain tail (one fixed
    // double expression tree — sqrt + division, bit-identical).
    "nq_rms_normalize" -> ((s: SparkSession, _: String) => {
      val out = Augment.rmsNormalize(clips(s), targetRms = 0.1)
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(
          out.select("phrase_id", "sumsq", "n_samples"),
          s"$Dir/rms_moments.parquet")
      out.select(col("phrase_id"), col("n_samples"),
          round(col("rms"), 6).as("rms"),
          round(col("gain"), 6).as("gain"))
        .orderBy("phrase_id")
    }),
    // Voice activity detection (librosa.effects.split semantics,
    // topDb=30): segments of voiced frames per clip. Everything past
    // the dumped (clip, frame, Σx²) energies — rms, clip-peak
    // reference, the 10^(−topDb/20) threshold, gaps-and-islands — is
    // shared-order arithmetic the oracle re-runs identically.
    "nq_vad" -> ((s: SparkSession, _: String) => {
      val frames = SpectralFeatures.frameSpectra(clips(s), NFft, Hop)
      if (graft.OracleDump.enabled)
        graft.OracleDump.dump(
          frames.select("phrase_id", "frame_id", "sumsq", "sample_rate"),
          s"$Dir/vad_frames.parquet")
      Vad.segments(frames, NFft, Hop, topDb = 30.0)
        .select(col("phrase_id"), col("seg_id"), col("start_frame"),
          col("end_frame"), col("n_frames"), col("start_sample"),
          col("end_sample"),
          round(col("start_sec"), 6).as("start_sec"),
          round(col("dur_sec"), 6).as("dur_sec"),
          round(col("peak_rms"), 6).as("peak_rms"))
        .orderBy("phrase_id", "seg_id")
    }),
    // SpecAugment masking: the drawn masks are data; the oracle
    // re-applies the zeroing CASE — an exact hash with no rounding.
    "nq_specaugment" -> ((s: SparkSession, _: String) => {
      val mel = new MelSpectrogram().transform(clips(s))
      val exploded = mel.select(col("phrase_id"), col("frame_id"),
        posexplode(col("mel")).as(Seq("k", "v")))
      val masks = SpecAugment.drawMasks(mel, NMels, MaskSeed)
      if (graft.OracleDump.enabled) {
        graft.OracleDump.dump(exploded, s"$Dir/premask.parquet")
        graft.OracleDump.dump(masks, s"$Dir/masks.parquet")
      }
      SpecAugment.applyMasks(exploded, masks)
        .select("phrase_id", "frame_id", "k", "v")
        .orderBy("phrase_id", "frame_id", "k")
    }))

  // the Δ-kernel numerator, generated once so the SQL text and the
  // Spark expression can't drift: left-associated (+) over d = 1..4,
  // each term d·(clamped lead − clamped lag)
  private def deltaNum(v: String): String =
    (1 to 4).map(d =>
      s"$d.0 * (coalesce(p$d, ${v}_last) - coalesce(m$d, ${v}_first))")
      .mkString(" + ")

  private def deltaWindows(v: String): String =
    s"""first_value($v) OVER pk AS ${v}_first,
       |last_value($v) OVER pk AS ${v}_last,
       |${(1 to 4).map(d =>
            s"lag($v, $d) OVER po AS m$d, lead($v, $d) OVER po AS p$d")
          .mkString(",\n")}""".stripMargin

  val oracle: Map[String, String] = Map(
    "nq_spectral" ->
      s"""WITH f AS (
         |  SELECT * FROM read_parquet('$Dir/spectral_ps.parquet/*.parquet')),
         |bl AS (
         |  SELECT list(freq ORDER BY k) AS freqs, list(one ORDER BY k) AS ones
         |  FROM read_parquet('$Dir/spectral_bins.parquet/*.parquet')),
         |base AS (
         |  SELECT f.phrase_id, f.frame_id, f.frame_time, f.ps, f.sumsq,
         |    f.zc, bl.freqs AS freqs, bl.ones AS ones,
         |    list_dot_product(f.ps, bl.ones) AS sum_s,
         |    list_dot_product(f.ps, bl.freqs)
         |      / list_dot_product(f.ps, bl.ones) AS centroid
         |  FROM f CROSS JOIN bl),
         |feat AS (
         |  SELECT phrase_id, frame_id, frame_time, sumsq, zc, sum_s,
         |    centroid,
         |    sqrt(list_dot_product(ps, list_transform(freqs,
         |      x -> (x - centroid) * (x - centroid))) / sum_s) AS bandwidth,
         |    exp(list_dot_product(list_transform(ps,
         |      v -> ln(greatest(v, 1e-10))), ones) / $NBins.0)
         |      / (sum_s / $NBins.0) AS flatness
         |  FROM base),
         |ex AS (
         |  -- lockstep unnest, NOT a cross join against the bin table:
         |  -- carrying the 257-double ps list across 8M joined rows
         |  -- made the first form ~200s; this one is ~1s
         |  SELECT phrase_id, frame_id, unnest(ps) AS v,
         |    unnest(range($NBins)) AS k, 0.85 * sum_s AS thr
         |  FROM base),
         |cumx AS (
         |  SELECT phrase_id, frame_id, k, thr,
         |    sum(v) OVER (PARTITION BY phrase_id, frame_id
         |      ORDER BY k ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM ex),
         |roll AS (
         |  SELECT c.phrase_id, c.frame_id,
         |    min(CASE WHEN c.cum >= c.thr THEN bb.freq END) AS rolloff
         |  FROM cumx c JOIN
         |    read_parquet('$Dir/spectral_bins.parquet/*.parquet') bb
         |    ON bb.k = c.k
         |  GROUP BY 1, 2)
         |SELECT t.phrase_id, t.frame_id,
         |  round(t.frame_time, 6) AS frame_time,
         |  round(t.centroid, 6) AS centroid,
         |  round(t.bandwidth, 6) AS bandwidth,
         |  round(r.rolloff, 6) AS rolloff,
         |  round(t.flatness, 6) AS flatness,
         |  round(sqrt(t.sumsq / $NFft.0), 6) AS rms,
         |  round(t.zc / ${NFft - 1}.0, 6) AS zcr
         |FROM feat t JOIN roll r USING (phrase_id, frame_id)
         |ORDER BY phrase_id, frame_id""".stripMargin,
    "nq_mfcc_delta" ->
      s"""WITH f AS (
         |  SELECT * FROM read_parquet('$Dir/delta_logmel.parquet/*.parquet')),
         |b AS (
         |  SELECT * FROM read_parquet('$Dir/delta_basis.parquet/*.parquet')),
         |m AS (
         |  SELECT f.phrase_id, f.frame_id, b.k,
         |    list_dot_product(f.v, b.basis) * b.scale AS c
         |  FROM f CROSS JOIN b),
         |w1 AS (
         |  SELECT phrase_id, frame_id, k, c, ${deltaWindows("c")}
         |  FROM m
         |  WINDOW po AS (PARTITION BY phrase_id, k ORDER BY frame_id),
         |    pk AS (PARTITION BY phrase_id, k ORDER BY frame_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |d1 AS (
         |  SELECT phrase_id, frame_id, k, c,
         |    (${deltaNum("c")}) / 60.0 AS dv
         |  FROM w1),
         |w2 AS (
         |  SELECT phrase_id, frame_id, k, c, dv, ${deltaWindows("dv")}
         |  FROM d1
         |  WINDOW po AS (PARTITION BY phrase_id, k ORDER BY frame_id),
         |    pk AS (PARTITION BY phrase_id, k ORDER BY frame_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |d2 AS (
         |  SELECT phrase_id, frame_id, k, c, dv,
         |    (${deltaNum("dv")}) / 60.0 AS dv2
         |  FROM w2)
         |-- "+ 0.0" normalizes IEEE -0.0 to +0.0 (exact identity for every
         |-- other double): DuckDB's round() keeps the sign of a tiny
         |-- negative (round(-1e-9,6) = -0.0) while Spark's BigDecimal
         |-- round returns +0.0 — same value, different STRING, and the
         |-- driver hashes strings (5 delta2 rows tripped this in r11)
         |SELECT phrase_id, frame_id, k,
         |  round(c, 6) + 0.0 AS mfcc, round(dv, 6) + 0.0 AS delta,
         |  round(dv2, 6) + 0.0 AS delta2
         |FROM d2
         |ORDER BY phrase_id, frame_id, k""".stripMargin,
    "nq_speed_perturb" ->
      s"""SELECT phrase_id, speed, count(*) AS n_out,
         |  CAST(sum(y6) AS BIGINT) AS dc6,
         |  CAST(sum(y6 * y6) AS BIGINT) AS energy6
         |FROM read_parquet('$Dir/perturbed.parquet/*.parquet')
         |GROUP BY phrase_id, speed
         |ORDER BY phrase_id, speed""".stripMargin,
    "nq_pitch_shift" ->
      s"""SELECT phrase_id, steps, count(*) AS n_out,
         |  CAST(sum(y6) AS BIGINT) AS dc6,
         |  CAST(sum(y6 * y6) AS BIGINT) AS energy6
         |FROM read_parquet('$Dir/pitched.parquet/*.parquet')
         |GROUP BY phrase_id, steps
         |ORDER BY phrase_id, steps""".stripMargin,
    "nq_griffinlim" ->
      s"""SELECT phrase_id, count(*) AS n_out,
         |  CAST(sum(y6) AS BIGINT) AS dc6,
         |  CAST(sum(y6 * y6) AS BIGINT) AS energy6
         |FROM read_parquet('$Dir/griffinlim.parquet/*.parquet')
         |GROUP BY phrase_id
         |ORDER BY phrase_id""".stripMargin,
    "nq_mel_invert" ->
      s"""SELECT phrase_id, count(*) AS n_out,
         |  CAST(sum(y6) AS BIGINT) AS dc6,
         |  CAST(sum(y6 * y6) AS BIGINT) AS energy6
         |FROM read_parquet('$Dir/melinvert.parquet/*.parquet')
         |GROUP BY phrase_id
         |ORDER BY phrase_id""".stripMargin,
    "nq_mix_snr" ->
      s"""WITH cp AS (
         |  SELECT * FROM read_parquet('$Dir/mix_clip_samples.parquet/*.parquet')),
         |np AS (
         |  SELECT * FROM read_parquet('$Dir/mix_noise_samples.parquet/*.parquet')),
         |pr AS (
         |  SELECT phrase_id, noise_id, nx, nn,
         |    CASE WHEN sumsq_n > 0.0
         |      THEN sqrt((sumsq_x / nx) / ((sumsq_n / nn) * pow(10.0, 1.0)))
         |      ELSE 0.0 END AS g
         |  FROM read_parquet('$Dir/mix_pairs.parquet/*.parquet')),
         |cpx AS (
         |  -- materialize the looped noise index BEFORE the noise join:
         |  -- an expression key spanning two relations (cp.i % pr.nn)
         |  -- forces DuckDB into a nested-loop join (minutes); a plain
         |  -- column key hash-joins (instant)
         |  SELECT cp.phrase_id, cp.sv, pr.noise_id, pr.g,
         |    cp.i % pr.nn AS j
         |  FROM cp JOIN pr USING (phrase_id)),
         |mx AS (
         |  SELECT cpx.phrase_id, cpx.noise_id, cpx.g,
         |    CAST(greatest(-32768.0, least(32767.0,
         |      floor((cpx.sv / 32768.0 + cpx.g * (np.sv / 32768.0))
         |        * 32768.0 + 0.5))) AS BIGINT) AS ms
         |  FROM cpx
         |  JOIN np ON np.noise_id = cpx.noise_id AND np.i = cpx.j)
         |SELECT phrase_id, noise_id, round(g, 6) AS gain,
         |  CAST(count(*) AS BIGINT) AS n_samples,
         |  CAST(sum(ms) AS BIGINT) AS dc,
         |  CAST(sum(ms * ms) AS BIGINT) AS energy
         |FROM mx
         |GROUP BY phrase_id, noise_id, g
         |ORDER BY phrase_id""".stripMargin,
    "nq_rms_normalize" ->
      s"""SELECT phrase_id, n_samples,
         |  round(sqrt(sumsq / n_samples), 6) AS rms,
         |  round(CASE WHEN sqrt(sumsq / n_samples) > 0.0
         |    THEN 0.1 / sqrt(sumsq / n_samples) ELSE 1.0 END, 6) AS gain
         |FROM read_parquet('$Dir/rms_moments.parquet/*.parquet')
         |ORDER BY phrase_id""".stripMargin,
    "nq_audio_store" ->
      s"""WITH u AS (
         |  SELECT * FROM read_parquet('$Dir/store_b0.parquet/*.parquet')
         |  UNION ALL
         |  SELECT * FROM read_parquet('$Dir/store_b1.parquet/*.parquet'))
         |SELECT clip_id, count(*) AS n_frames,
         |  CAST(sum(zc) AS BIGINT) AS sum_zc,
         |  round(min(centroid), 6) AS min_centroid,
         |  round(max(bandwidth), 6) AS max_bandwidth
         |FROM u WHERE clip_id <> $DeletedClip
         |GROUP BY clip_id
         |ORDER BY clip_id""".stripMargin,
    "nq_vad" ->
      s"""WITH f AS (
         |  SELECT * FROM read_parquet('$Dir/vad_frames.parquet/*.parquet')),
         |r AS (
         |  SELECT phrase_id, frame_id, sample_rate,
         |    sqrt(sumsq / $NFft.0) AS rms
         |  FROM f),
         |m AS (
         |  SELECT *, max(rms) OVER (PARTITION BY phrase_id) AS max_rms
         |  FROM r),
         |v AS (
         |  SELECT * FROM m WHERE rms > max_rms * pow(10.0, -1.5)),
         |i AS (
         |  SELECT *, frame_id - row_number()
         |    OVER (PARTITION BY phrase_id ORDER BY frame_id) AS isl
         |  FROM v),
         |g AS (
         |  SELECT phrase_id, isl,
         |    min(frame_id) AS start_frame, max(frame_id) AS end_frame,
         |    count(*) AS n_frames, max(rms) AS peak_rms,
         |    min(sample_rate) AS sr
         |  FROM i GROUP BY 1, 2)
         |SELECT phrase_id,
         |  row_number() OVER (PARTITION BY phrase_id ORDER BY start_frame)
         |    - 1 AS seg_id,
         |  start_frame, end_frame, n_frames,
         |  start_frame * $Hop AS start_sample,
         |  end_frame * $Hop + $NFft AS end_sample,
         |  round(CAST(start_frame AS DOUBLE) * $Hop / sr, 6) AS start_sec,
         |  round(CAST(end_frame * $Hop + $NFft - start_frame * $Hop
         |    AS DOUBLE) / sr, 6) AS dur_sec,
         |  round(peak_rms, 6) AS peak_rms
         |FROM g
         |ORDER BY phrase_id, seg_id""".stripMargin,
    "nq_specaugment" ->
      s"""WITH p AS (
         |  SELECT * FROM read_parquet('$Dir/premask.parquet/*.parquet')),
         |msk AS (
         |  SELECT * FROM read_parquet('$Dir/masks.parquet/*.parquet'))
         |SELECT p.phrase_id, p.frame_id, p.k,
         |  CASE WHEN EXISTS (
         |    SELECT 1 FROM msk m WHERE m.phrase_id = p.phrase_id
         |      AND ((m.kind = 't' AND p.frame_id >= m."start"
         |            AND p.frame_id < m."start" + m.width)
         |        OR (m.kind = 'f' AND p.k >= m."start"
         |            AND p.k < m."start" + m.width)))
         |  THEN 0.0 ELSE p.v END AS v
         |FROM p
         |ORDER BY phrase_id, frame_id, k""".stripMargin)
}
