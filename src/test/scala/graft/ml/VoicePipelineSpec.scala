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
}
