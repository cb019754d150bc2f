package graft.sources

import graft.SparkSpec
import graft.gen.VoiceDataGen
import org.apache.spark.sql.functions._

/** Round-trips for the peripheral sources/sinks (SURVEY §2.A):
  * binary media files (A3/A5), CSV transcript (A1/A2), and the
  * mapPartitions decode/feature path.
  */
class MediaSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("pcm binary sink + binaryFile scan round-trip") {
    val dir = tmpDir("pcm")
    val gen = VoiceDataGen.generate(spark, 3).cache()
    MediaSource.writePcmFiles(gen, "phrase_id", "pcm", dir)
    // non-numeric and trailing-digit basenames are skipped, never
    // aliased onto a real clip_id (same anchoring as the wav scan)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "backup2.pcm"), Array[Byte](1, 2))
    val back = MediaSource.readPcmFiles(spark, dir)
    assert(back.count() == 3)
    assert(back.filter($"clip_id" === 2L).count() == 1,
      "backup2.pcm must not alias the genuine 2.pcm")
    val orig = gen.select("phrase_id", "n_samples")
      .as[(Long, Int)].collect().toMap
    back.select("clip_id", "n_samples").as[(Long, Int)].collect()
      .foreach { case (id, n) => assert(orig(id) == n, s"clip $id") }
    // byte-exact content round-trip
    val origBytes = gen.filter($"phrase_id" === 0).select("pcm")
      .as[Array[Byte]].head()
    val backBytes = back.filter($"clip_id" === 0).select("pcm")
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(origBytes, backBytes))
  }

  test("wav container sink + scan round-trip (JDK codec, header-carried rate)") {
    val dir = tmpDir("wav")
    // MIXED sample rates: clip 100 claims 8 kHz — each header must carry
    // its own row's rate, not one stamped scalar
    val gen = VoiceDataGen.generate(spark, 3)
      .select(col("phrase_id"), col("pcm"), col("sample_rate"))
      .unionByName(VoiceDataGen.generate(spark, 1)
        .select((col("phrase_id") + 100L).as("phrase_id"), col("pcm"),
          lit(8000).as("sample_rate")))
      .cache()
    MediaSource.writeWavFiles(gen, "phrase_id", "pcm", "sample_rate", dir)
    // hostile directory entries: a non-numeric basename (skipped — no
    // clip id to carry), a TRAILING-DIGIT basename (skipped too: an
    // unanchored extract would read clip_id 2 out of "backup2.wav" and
    // silently collide with the genuine 2.wav), and a corrupt numeric
    // one (decoded=false row)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "backup.wav"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "backup2.wav"), Array[Byte](4, 5, 6))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "999.wav"), Array[Byte](9, 9, 9, 9))
    val back = MediaSource.readWavFiles(spark, dir).cache()
    assert(back.count() == 5, "4 real clips + 1 corrupt verdict row")
    assert(back.filter($"clip_id" === 2L).count() == 1,
      "backup2.wav must not alias the genuine 2.wav")
    val bad = back.filter($"clip_id" === 999L).head()
    assert(!bad.getBoolean(1) && bad.isNullAt(2),
      "corrupt file must carry decoded=false + null payload")
    val good = back.filter($"decoded")
    // the sample rate must come from each file's OWN header
    assert(good.filter($"clip_id" === 100L).select("sample_rate")
      .as[Int].head() === 8000)
    assert(good.filter($"clip_id" < 100L).select("sample_rate")
      .distinct().as[Int].collect().toSeq === Seq(VoiceDataGen.SampleRate))
    // byte-exact PCM payload through the container
    val origBytes = gen.filter($"phrase_id" === 1).select("pcm")
      .as[Array[Byte]].head()
    val backBytes = good.filter($"clip_id" === 1).select("pcm")
      .as[Array[Byte]].head()
    assert(java.util.Arrays.equals(origBytes, backBytes))
    // and the decoded clips feed the same feature path as raw PCM
    val viaWav = MediaSource.audioFeatures(
      good.filter($"clip_id" < 100L)
        .select("clip_id", "pcm", "sample_rate"))
      .orderBy("clip_id").collect()
    val viaPcm = MediaSource.audioFeatures(
      gen.filter($"phrase_id" < 100L)
        .select(col("phrase_id").as("clip_id"), col("pcm"),
          col("sample_rate"))).orderBy("clip_id").collect()
    assert(viaWav.sameElements(viaPcm), "container must not alter audio")
    back.unpersist(); gen.unpersist()
  }

  test("audio feature extraction over binary column") {
    val gen = VoiceDataGen.generate(spark, 2)
    val feats = MediaSource.audioFeatures(
      gen.select(col("phrase_id").as("clip_id"), col("pcm"),
        col("sample_rate")))
    val rows = feats.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("rms") > 0.01, "silent clip?")
      assert(r.getAs[Double]("peak") <= 1.0)
      assert(r.getAs[Double]("zcr") > 0.0)
      assert(r.getAs[Double]("duration_sec") >= 1.0)
    }
  }

  test("audioFeatures composes with readWavFiles verdicts: null rows skipped") {
    // readWavFiles emits decoded=false rows with null pcm/sample_rate for
    // corrupt files — feeding its output straight into audioFeatures must
    // not NPE the scan, and the good clips must still score
    val gen = VoiceDataGen.generate(spark, 2)
    val dir = tmpDir("wavbad")
    MediaSource.writeWavFiles(gen, "phrase_id", "pcm", "sample_rate", dir)
    java.nio.file.Files.write( // numeric basename, corrupt content
      java.nio.file.Paths.get(dir, "999.wav"), Array[Byte](82, 73, 70))
    val clips = MediaSource.readWavFiles(spark, dir)
    assert(clips.count() == 3)
    val feats = MediaSource.audioFeatures(clips).collect()
    assert(feats.length == 2, "only decodable clips carry features")
    assert(!feats.map(_.getAs[Long]("clip_id")).contains(999L))
    feats.foreach(r => assert(r.getAs[Double]("rms") > 0.01))
  }

  test("transcript CSV sink + schema'd scan round-trip (A1/A2)") {
    val dir = tmpDir("csv")
    val t = VoiceDataGen.transcript(spark, 5)
    t.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("speaker",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("seconds",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    val a = t.orderBy("seconds").collect()
    val b = back.orderBy("seconds").collect()
    assert(a.sameElements(b))
  }

  test("fitted PipelineModel save/load is self-contained (A7, quirk Q5)") {
    val dir = tmpDir("model")
    val ts = graft.ml.VoicePipeline.timeSeries(spark, nPhrases = 3).cache()
    val indexer = new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol("speaker").setOutputCol("label")
      .setStringOrderType("alphabetAsc")
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("Time", "X")).setOutputCol("features")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
    val model = new org.apache.spark.ml.Pipeline()
      .setStages(Array(indexer, assembler, lr)).fit(ts)
    model.write.overwrite().save(dir)
    // a fresh load must be able to predict with NO train-time state
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val preds = loaded.transform(ts)
    assert(preds.select("prediction").distinct().count() == 2)
  }

  test("binary publish (r18): overwrite-rename replaces without a " +
      "delete window; the no-FileContext fallback keeps a complete " +
      "target and replaces a partial one") {
    import org.apache.hadoop.fs.Path
    val dir = tmpDir("pub")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(p: Path, bytes: Array[Byte]): Unit = {
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    }
    def len(p: Path) = fs.getFileStatus(p).getLen
    val winner = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    // fallback arm, complete target already standing (the zombie
    // scenario): the tmp drops, the winner's file is NEVER deleted
    val t1 = new Path(base, "7.pcm"); put(t1, winner)
    val tmp1 = new Path(base, ".tmp-a-7.pcm"); put(tmp1, winner)
    MediaSource.publish(fs, None, tmp1, t1, winner.length.toLong)
    assert(!fs.exists(tmp1) && len(t1) === 8L)
    // fallback arm, absent target: rename lands
    val t2 = new Path(base, "8.pcm")
    val tmp2 = new Path(base, ".tmp-a-8.pcm"); put(tmp2, winner)
    MediaSource.publish(fs, None, tmp2, t2, winner.length.toLong)
    assert(fs.exists(t2) && !fs.exists(tmp2) && len(t2) === 8L)
    // fallback arm, PARTIAL target (a crashed pre-r17 O_TRUNC write):
    // replaced by the complete tmp
    val t3 = new Path(base, "9.pcm"); put(t3, winner.take(3))
    val tmp3 = new Path(base, ".tmp-a-9.pcm"); put(tmp3, winner)
    MediaSource.publish(fs, None, tmp3, t3, winner.length.toLong)
    assert(len(t3) === 8L)
    // FileContext arm: atomic overwrite of a standing target, no
    // delete step at all (this is the arm every local/HDFS run takes)
    val fc = Some(org.apache.hadoop.fs.FileContext.getFileContext(
      base.toUri, spark.sparkContext.hadoopConfiguration))
    val tmp4 = new Path(base, ".tmp-b-7.pcm")
    put(tmp4, winner.take(4))
    MediaSource.publish(fs, fc, tmp4, t1, 4L)
    assert(len(t1) === 4L && !fs.exists(tmp4))
  }
}
