package graft.ml

import graft.SparkSpec
import graft.audio.MelSpectrogram
import graft.gen.VoiceDataGen
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._

/** A7 complete (SURVEY §1.3 quirk Q5): the FULL pipeline — feature
  * extraction (custom MelSpectrogram transformer) and feature selection
  * (custom MiSelector estimator) included — persists and reloads with no
  * train-time state, via the stock DefaultParamsWritable machinery.
  * Round 1 could only persist the indexer→scaler→classifier suffix.
  */
class PipelinePersistenceSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"persist-$tag").toString

  test("MelSpectrogram inside a PipelineModel round-trips save/load") {
    val clips = VoiceDataGen.generate(spark, 3).drop("speaker").cache()
    val mel = new MelSpectrogram().setNMels(8).setNFft(512)
    val model = new Pipeline().setStages(Array(mel)).fit(clips)
    val dir = tmpDir("mel")
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    // loaded stage must carry the non-default params…
    val st = loaded.stages(0).asInstanceOf[MelSpectrogram]
    assert(st.getOrDefault(st.nMels) === 8 && st.getOrDefault(st.nFft) === 512)
    // …and produce identical frames
    val a = model.transform(clips).orderBy("phrase_id", "frame_id").collect()
    val b = loaded.transform(clips).orderBy("phrase_id", "frame_id").collect()
    assert(a.sameElements(b))
  }

  test("MiSelector estimator + model round-trip inside a full PipelineModel") {
    val lf = VoicePipeline.labeledFrames(spark, nPhrases = 3).cache()
    val selector = new MiSelector()
      .setFeatureCols(Array("c0", "c1", "c2", "c3"))
      .setLabelCol("speaker").setOutputCol("X")
    val indexer = new StringIndexer().setInputCol("speaker")
      .setOutputCol("label").setStringOrderType("alphabetAsc")
    val assembler = new VectorAssembler()
      .setInputCols(Array("Time", "X")).setOutputCol("features")
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label")
    val model = new Pipeline()
      .setStages(Array(selector, indexer, assembler, lr)).fit(lf)
    val dir = tmpDir("full")
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    // fitted selector state survives the round-trip
    val sel = loaded.stages(0).asInstanceOf[MiSelectorModel]
    val orig = model.stages(0).asInstanceOf[MiSelectorModel]
    assert(sel.getSelectedCol === orig.getSelectedCol)
    assert(sel.getMiScores.toSeq === orig.getMiScores.toSeq)
    // end-to-end: identical predictions from the reloaded pipeline
    val a = model.transform(lf).select("Time", "prediction")
      .orderBy("Time").collect()
    val b = loaded.transform(lf).select("Time", "prediction")
      .orderBy("Time").collect()
    assert(a.sameElements(b))
  }

  test("unfitted Pipeline (estimator graph) itself persists — train elsewhere, fit anywhere") {
    val dir = tmpDir("est")
    val pipe = new Pipeline().setStages(Array(
      new MelSpectrogram().setNMels(6),
      new MiSelector().setFeatureCols(Array("c0")).setLabelCol("speaker")))
    pipe.write.overwrite().save(dir)
    val back = Pipeline.load(dir)
    assert(back.getStages.length === 2)
    assert(back.getStages(0).isInstanceOf[MelSpectrogram])
    assert(back.getStages(1).isInstanceOf[MiSelector])
  }
}
