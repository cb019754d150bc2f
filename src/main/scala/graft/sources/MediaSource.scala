package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary sources/sinks (SURVEY §2.A A3/A5, §2.K multimodal
  * columns): opaque media bytes + typed metadata, decode behind a
  * per-partition boundary.
  *
  * The engine's convention for image/audio/video at 100 TB:
  *   - at rest: either raw files (binaryFile source) or Parquet with a
  *     BINARY column + metadata struct (this file supports both);
  *   - decode / feature-extract: mapPartitions over the binary column —
  *     never a per-row driver loop; decoders initialize once per
  *     partition;
  *   - only this container ships no media codecs, so decode here is the
  *     REAL PCM16 decoder (graft.audio.Dsp) for audio, and downstream
  *     feature extraction is the real MelSpectrogram transformer.
  */
object MediaSource {

  /** Shared executor-side per-row binary sink. Hadoop FileSystem API,
    * resolved per-executor from the path's scheme: plain java.nio would
    * write to each executor's LOCAL disk on a multi-node cluster,
    * silently scattering the sink. With an hdfs://, s3a://,
    * file://-on-shared-mount dir this lands all files in one place;
    * local mode behaves identically. The SESSION's Hadoop configuration
    * ships to the executors (SerializableConfiguration) — a bare
    * `new Configuration()` would drop every spark.hadoop.* setting, so
    * an s3a:// sink whose credentials/endpoint arrive via spark-submit
    * would fail auth on every partition. `encode` maps (payload bytes,
    * extra column) → file bytes.
    */
  private[sources] def writeBinaryFiles(rows: DataFrame, ext: String, dir: String)(
      encode: org.apache.spark.sql.Row => Array[Byte]): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      rows.sparkSession.sparkContext.hadoopConfiguration)
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(hconf.value)
      fs.mkdirs(base)
      // per-attempt tmp name + rename: these are side-effect writes
      // with no task-commit protocol, so under speculative execution
      // (or a zombie attempt after a network partition) two attempts
      // of the same partition write the same <id>.ext concurrently —
      // two O_TRUNC streams interleaving buffers corrupt the file.
      // Each attempt writes its own uniquely-named tmp and renames;
      // content is deterministic per row, so whichever rename lands
      // first wins and the loser just cleans up its tmp.
      val attempt = java.util.UUID.randomUUID().toString
      // publish protocol resolved ONCE per partition: FileContext's
      // rename(OVERWRITE) is the no-window path (r18) — the previous
      // delete-target-then-rename left a zombie window where a stale
      // attempt deletes the winner's completed file and dies before
      // its own rename, leaving the row's file MISSING with no error
      // surfaced. Schemes with no AbstractFileSystem binding (s3a
      // commonly) fall back to delete+rename, skipped entirely when
      // the target already holds the expected byte count.
      val fc: Option[org.apache.hadoop.fs.FileContext] =
        try Some(org.apache.hadoop.fs.FileContext.getFileContext(
          base.toUri, hconf.value))
        catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            None
        }
      it.foreach { r =>
        val target = new org.apache.hadoop.fs.Path(base,
          s"${r.getLong(0)}.$ext")
        val tmp = new org.apache.hadoop.fs.Path(base,
          s".tmp-$attempt-${r.getLong(0)}.$ext")
        val bytes = encode(r)
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        publish(fs, fc, tmp, target, bytes.length.toLong)
      }
    }
  }

  /** Move a fully-written per-attempt tmp into place. Preferred arm:
    * atomic overwrite rename (no delete window, losers just replace
    * the winner's identical bytes). Fallback arm (no FileContext
    * binding for the scheme): a target already at the expected length
    * IS this row's output — content is deterministic per row — so the
    * tmp drops; an ABSENT target takes a plain rename (no delete
    * step, no window); a PARTIAL target is overwritten IN PLACE via
    * `create(overwrite)` (r19 ADVICE — the old delete-then-rename
    * left a crash window where the row's file was MISSING with no
    * error until a full re-run; a crash mid-copy now leaves a
    * wrong-length partial instead, which the next attempt detects and
    * re-publishes). Re-runs of the whole job legitimately overwrite
    * in both arms (the fallback's equal-length skip assumes per-row
    * determinism, the sinks' documented contract). */
  private[sources] def publish(fs: org.apache.hadoop.fs.FileSystem,
      fc: Option[org.apache.hadoop.fs.FileContext],
      tmp: org.apache.hadoop.fs.Path, target: org.apache.hadoop.fs.Path,
      expectedLen: Long): Unit = fc match {
    case Some(c) =>
      c.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    case None =>
      val standing =
        try Some(fs.getFileStatus(target).getLen)
        catch { case _: java.io.FileNotFoundException => None }
      standing match {
        case Some(len) if len == expectedLen =>
          fs.delete(tmp, false)
        case None =>
          // absent target: rename straight in — losing the rename
          // means a concurrent attempt won with identical bytes
          if (!fs.rename(tmp, target)) fs.delete(tmp, false)
        case Some(_) =>
          val in = fs.open(tmp)
          try {
            val out = fs.create(target, true)
            try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536,
              false)
            finally out.close()
          } finally in.close()
          fs.delete(tmp, false)
      }
  }

  /** Binary sink: one file per row, named <id>.pcm (the distributed
    * analogue of the reference's per-phrase MP3 export,
    * `data_generator.py:26-27`). Executor-side writes, no driver loop.
    */
  def writePcmFiles(df: DataFrame, idCol: String, pcmCol: String,
      dir: String): Unit =
    writeBinaryFiles(df.select(col(idCol).cast("long"), col(pcmCol)),
      "pcm", dir)(_.getAs[Array[Byte]](1))

  /** binaryFile scan (A3): files → (clip_id from filename, pcm bytes,
    * metadata). Filters and the 4-column projection are handled by the
    * binaryFile datasource; decode happens lazily downstream.
    */
  def readPcmFiles(spark: SparkSession, dir: String,
      sampleRate: Int = graft.gen.VoiceDataGen.SampleRate): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pcm")
      .load(dir)
      .select(
        // anchored (see readWavFiles): only fully-numeric basenames
        // carry a clip_id; "backup2.pcm" is skipped, not aliased to 2
        regexp_extract(col("path"), "(?:^|/)(\\d+)\\.pcm$", 1).as("id_str"),
        col("content").as("pcm"))
      .filter(col("id_str") =!= "")
      .select(
        // try_cast + null filter: under ANSI mode a plain cast throws on
        // "" AND on a 20+ digit basename that overflows Long — both are
        // hostile directory entries to skip, not scan-killers
        expr("try_cast(id_str AS BIGINT)").as("clip_id"),
        col("pcm"),
        (length(col("pcm")) / 2).cast("int").as("n_samples"),
        lit(sampleRate).as("sample_rate"))
      .filter(col("clip_id").isNotNull)

  /** PCM16 mono → RIFF/WAVE container bytes via the JDK's own audio
    * codec (javax.sound.sampled — no external deps). WAV carries the
    * sample rate IN the header, so readers need no side-channel.
    * Odd-length payloads are rejected (a floor-divided frame count
    * would silently drop the trailing byte).
    */
  private[graft] def wavBytes(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    require(pcm.length % 2 == 0,
      s"wavBytes: odd PCM16 payload (${pcm.length} bytes) — truncated input?")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // 16-bit signed mono LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** WAV sink: one <id>.wav per row — the real-container upgrade of
    * writePcmFiles (shared executor-side Hadoop-FS discipline). The
    * sample rate is read from the PER-ROW `rateCol`: a scalar parameter
    * would silently stamp one rate into every header on mixed-rate
    * input, corrupting exactly the metadata the container exists to
    * carry.
    */
  def writeWavFiles(df: DataFrame, idCol: String, pcmCol: String,
      rateCol: String, dir: String): Unit =
    writeBinaryFiles(
      df.select(col(idCol).cast("long"), col(pcmCol),
        col(rateCol).cast("int")),
      "wav", dir)(r => wavBytes(r.getAs[Array[Byte]](1), r.getInt(2)))

  /** WAV scan (A3, real container): binaryFile + JDK codec decode per
    * partition; sample rate comes from each file's OWN header, not a
    * caller parameter — the property a real container buys.
    *
    * Files whose basename is not purely numeric are skipped (they can't
    * carry a clip_id; the glob alone can't exclude them, and an ANSI
    * cast of "" would otherwise kill the scan). Undecodable or
    * nonconforming content (corrupt bytes, stereo, non-PCM encodings)
    * yields decoded=false with null payload — one bad file must not
    * fail a 10k-file scan (same verdict discipline as ImageSource).
    */
  def readWavFiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir)
      .select(
        // anchored at a path separator: a trailing-digit basename like
        // "backup2.wav" must NOT yield clip_id 2 and collide with a
        // genuine "2.wav" — only fully-numeric basenames carry an id
        regexp_extract(col("path"), "(?:^|/)(\\d+)\\.wav$", 1).as("id_str"),
        col("content"))
      .filter(col("id_str") =!= "")
      // try_cast: a 20+ digit numeric basename overflows Long and a
      // plain ANSI cast would fail the scan instead of skipping it
      .select(expr("try_cast(id_str AS BIGINT)").as("clip_id"),
        col("content"))
      .filter(col("clip_id").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              require(fmt.getEncoding ==
                  javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                  fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
                s"expected 16-bit signed PCM mono, got $fmt")
              val pcm = ais.readAllBytes()
              (id, true, Some(pcm), Some(pcm.length / 2),
                Some(fmt.getSampleRate.toInt))
            } finally ais.close()
          } catch {
            case _: Exception =>
              (id, false, None: Option[Array[Byte]], None: Option[Int],
                None: Option[Int])
          }
        }
      }
      .toDF("clip_id", "decoded", "pcm", "n_samples", "sample_rate")
  }

  /** Decode + summary feature extraction over the binary column in one
    * mapPartitions pass: waveform stats the cheap way (no shuffle).
    *
    * Rows with a null payload are skipped, not crashed on: readWavFiles
    * deliberately emits decoded=false rows with null pcm/sample_rate for
    * corrupt files, and composing the two APIs must not let one bad file
    * NPE the scan the verdict rows exist to protect (the verdict stays
    * visible in the source relation).
    */
  def audioFeatures(clips: DataFrame): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("clip_id"), col("pcm"), col("sample_rate"))
      .filter(col("pcm").isNotNull && col("sample_rate").isNotNull)
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.map { case (id, pcm, sr) =>
          val x = graft.audio.Dsp.pcm16ToDoubles(pcm)
          val n = x.length
          val mean = x.sum / math.max(1, n)
          val rms = math.sqrt(x.map(v => v * v).sum / math.max(1, n))
          val peak = if (n == 0) 0.0 else x.map(math.abs).max
          // zero-crossing rate: voicing proxy
          var zc = 0
          var i = 1
          while (i < n) { if (x(i - 1) * x(i) < 0) zc += 1; i += 1 }
          (id, n, n.toDouble / sr, mean, rms, peak,
            zc.toDouble / math.max(1, n - 1))
        }
      }
      .toDF("clip_id", "n_samples", "duration_sec", "mean", "rms", "peak",
        "zcr")
  }
}
