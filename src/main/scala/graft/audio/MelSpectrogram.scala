package graft.audio

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, IntParam, DoubleParam, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom `ml.Transformer`: PCM-binary audio → tidy frame×mel table.
  *
  * Rebuild of the reference's feature-extraction stage
  * (`/root/reference/src/voice_classifier.py:80-83`: `librosa.load` +
  * `melspectrogram(n_mels=20, fmax=8000)` + transpose to frames-as-rows
  * at `voice_classifier.py:115-116`) as a distributed operator:
  * each input row is (id, start_sec, pcm, sample_rate); output is one row
  * per STFT frame with its global time and mel power vector — Spark's
  * natural row orientation, so every downstream op (PCA, join, agg) is
  * embarrassingly parallel.
  *
  * Scale: per-partition cost is frames × O(nFft log nFft); no shuffle is
  * introduced (narrow mapPartitions). Window + filterbank are computed
  * once per partition. Framing is per-clip (no cross-row frames): unlike
  * librosa there is no center-padding — frame f covers samples
  * [f·hop, f·hop+nFft), a documented deviation (SURVEY §7.4 risk 1;
  * acceptance is downstream separability, not float parity).
  */
class MelSpectrogram(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("melspec"))

  final val idCol = new Param[String](this, "idCol", "clip id column")
  final val pcmCol = new Param[String](this, "pcmCol", "16-bit PCM binary column")
  final val startSecCol = new Param[String](this, "startSecCol",
    "clip start offset (seconds) column")
  final val sampleRateCol = new Param[String](this, "sampleRateCol",
    "sample rate column")
  final val nMels = new IntParam(this, "nMels", "number of mel bands")
  final val nFft = new IntParam(this, "nFft", "FFT frame length")
  final val hop = new IntParam(this, "hop", "hop length in samples")
  final val fMax = new DoubleParam(this, "fMax", "max mel frequency (Hz)")

  setDefault(idCol -> "phrase_id", pcmCol -> "pcm",
    startSecCol -> "start_sec", sampleRateCol -> "sample_rate",
    nMels -> 20, nFft -> 2048, hop -> 512, fMax -> 8000.0)

  def setIdCol(v: String): this.type = set(idCol, v)
  def setPcmCol(v: String): this.type = set(pcmCol, v)
  def setStartSecCol(v: String): this.type = set(startSecCol, v)
  def setSampleRateCol(v: String): this.type = set(sampleRateCol, v)
  def setNMels(v: Int): this.type = set(nMels, v)
  def setNFft(v: Int): this.type = set(nFft, v)
  def setHop(v: Int): this.type = set(hop, v)
  def setFMax(v: Double): this.type = set(fMax, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    validateInputSchema(ds.schema)
    val spark = ds.sparkSession
    import spark.implicits._
    val (nm, nf, hp, fm) = ($(nMels), $(nFft), $(hop), $(fMax))
    val pcmName = $(pcmCol)
    val rows = ds.toDF()
      .select(col($(idCol)).cast("long"), col($(startSecCol)).cast("double"),
        col($(pcmCol)), col($(sampleRateCol)).cast("int"))
      .as[(Long, Double, Array[Byte], Int)]
    rows.mapPartitions { it =>
      var window: Array[Double] = null
      var fb: Array[Array[Double]] = null
      var fbSr = -1 // filterbank depends on the row's sample rate
      it.flatMap { case (id, startSec, pcm, sr) =>
        // legible failure with row context, not a bare NPE deep in Dsp:
        // a null payload here usually means an upstream decode verdict
        // row (e.g. readWavFiles decoded=false) leaked into the pipeline
        require(pcm != null,
          s"MelSpectrogram: null $pcmName for id=$id — filter " +
            "undecoded rows before feature extraction")
        if (window == null) window = Dsp.hannWindow(nf)
        if (fbSr != sr) {
          fb = Dsp.melFilterbank(nm, nf, sr, 0.0, fm)
          fbSr = sr
        }
        val x = Dsp.pcm16ToDoubles(pcm)
        val nFrames = if (x.length >= nf) (x.length - nf) / hp + 1 else 0
        (0 until nFrames).iterator.map { fi =>
          val frame = java.util.Arrays.copyOfRange(x, fi * hp, fi * hp + nf)
          val ps = Dsp.powerSpectrum(frame, window)
          val mel = new Array[Double](nm)
          var m = 0
          while (m < nm) {
            val row = fb(m)
            var acc = 0.0
            var k = 0
            while (k < ps.length) { acc += row(k) * ps(k); k += 1 }
            mel(m) = acc
            m += 1
          }
          (id, fi.toLong, startSec + fi.toDouble * hp / sr, mel)
        }
      }
    }.toDF($(idCol), "frame_id", "frame_time", "mel")
  }

  // validated at transformSchema time so Pipeline.fit's schema
  // propagation rejects a miswired pipeline at construction, not with an
  // opaque executor error hours into the run
  private def validateInputSchema(schema: StructType): Unit = {
    Seq($(idCol), $(startSecCol), $(pcmCol), $(sampleRateCol)).foreach { c =>
      require(schema.fieldNames.contains(c),
        s"MelSpectrogram: input column '$c' not found in " +
          s"(${schema.fieldNames.mkString(", ")})")
    }
    require(schema($(pcmCol)).dataType == BinaryType,
      s"MelSpectrogram: '${$(pcmCol)}' must be BINARY (16-bit PCM " +
        s"bytes), got ${schema($(pcmCol)).dataType.simpleString}")
  }

  override def transformSchema(schema: StructType): StructType = {
    validateInputSchema(schema)
    StructType(Seq(
      StructField($(idCol), LongType),
      StructField("frame_id", LongType),
      StructField("frame_time", DoubleType),
      StructField("mel", ArrayType(DoubleType, containsNull = false))))
  }

  override def copy(extra: ParamMap): MelSpectrogram = defaultCopy(extra)
}

object MelSpectrogram extends DefaultParamsReadable[MelSpectrogram] {

  /** `power_to_db(ref = global max, top_db = 80)` — the reference's E6
    * (`voice_classifier.py:83`), kept lazy/distributed: the global max is
    * a broadcast scalar aggregate joined back, then a codegen'd
    * per-element expression. Appends `mel_db`.
    */
  def toDb(frames: DataFrame, melCol: String = "mel"): DataFrame = {
    val ref = frames.agg(
      max(expr(s"array_max($melCol)")).as("ref_power"))
    frames.crossJoin(broadcast(ref))
      .withColumn("mel_db", expr(
        s"transform($melCol, v -> greatest(CAST(-80.0 AS DOUBLE), " +
          "10.0 * log10(greatest(v, 1e-10) / greatest(ref_power, 1e-10))))"))
      .drop("ref_power")
  }
}
