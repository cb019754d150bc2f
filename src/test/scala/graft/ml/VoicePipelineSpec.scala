package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline acceptance (SURVEY §5.2/§6): seeded generation →
  * features → train → ≥0.80 held-out accuracy (reference: 0.8731).
  * Runs on a reduced 7-phrase dataset to keep the suite fast.
  */
class VoicePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("labeled frames: classes present, time strictly within segments") {
    val lf = VoicePipeline.labeledFrames(spark, nPhrases = 4).cache()
    val speakers = lf.select("speaker").distinct().as[String].collect().toSet
    assert(speakers == Set("Male", "Female"))
    // every frame labeled exactly once: count equals distinct Time count
    assert(lf.count() == lf.select("Time").distinct().count())
  }

  test("MLP on (Time, X) reaches reference-band accuracy") {
    val r = VoicePipeline.trainAndEvaluate(spark, nPhrases = 7)
    assert(r.accuracy >= 0.80,
      s"accuracy ${r.accuracy} below the 0.80 acceptance bar")
    // confusion matrix covers both classes
    assert(r.confusion.count() == 2)
  }

  test("classificationReport: never-predicted class gets 0.0 precision, not NaN") {
    // degenerate predictions: the model only ever says Male — sklearn's
    // classification_report (the E5 reference) reports precision 0.0 for
    // Female, and the nq_voice_eval contract must match, not emit NaN
    val preds = Seq(
      ("Male", "Male"), ("Male", "Male"),
      ("Female", "Male"), ("Female", "Male"))
      .toDF("speaker", "speaker_pred")
    val rep = VoicePipeline.classificationReport(preds)
      .orderBy("speaker").collect()
    val female = rep(0)
    assert(female.getString(0) == "Female")
    assert(female.getDouble(1) == 0.0, "precision must be 0.0, not NaN")
    assert(female.getDouble(2) == 0.0) // recall: 0 tp / 2 support
    assert(!female.getDouble(3).isNaN) // f1 well-defined (denominator > 0)
    val male = rep(1)
    assert(male.getDouble(1) == 0.5 && male.getDouble(2) == 1.0)
  }
}
