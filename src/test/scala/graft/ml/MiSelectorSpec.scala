package graft.ml

import graft.SparkSpec

class MiSelectorSpec extends SparkSpec {
  import spark.implicits._

  test("selects the class-separating column over noise and constant") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 2000).map { i =>
      val label = if (i % 2 == 0) "Male" else "Female"
      val separating = (if (label == "Male") 5.0 else -5.0) + rnd.nextGaussian()
      val noise = rnd.nextGaussian() * 3.0
      val const = 1.0
      (label, separating, noise, const)
    }
    val df = rows.toDF("speaker", "good", "noise", "const")
    val model = new MiSelector()
      .setFeatureCols(Array("noise", "good", "const"))
      .setLabelCol("speaker").setOutputCol("X")
      .fit(df)
    assert(model.getSelectedCol == "good",
      s"picked ${model.getSelectedCol}, MI=${model.getMiScores.mkString(",")}")
    // output column projects the winner
    val out = model.transform(df)
    assert(out.filter($"X" =!= $"good").count() == 0)
  }

  test("partial-null candidate is rejected, not silently binned to 0") {
    // greatest() skips nulls, so without the guard a class-correlated
    // missingness pattern would land in bin 0 and fabricate MI
    val rows = (0 until 100).map { i =>
      val label = if (i % 2 == 0) "A" else "B"
      (label, if (label == "A" && i % 4 == 0) None else Some(i.toDouble),
        i.toDouble)
    }
    val df = rows.toDF("speaker", "holey", "clean")
    val e = intercept[IllegalArgumentException] {
      new MiSelector().setFeatureCols(Array("holey", "clean"))
        .setLabelCol("speaker").fit(df)
    }
    assert(e.getMessage.contains("holey") && e.getMessage.contains("null"))
  }

  test("NaN candidate is rejected, not silently top-binned (r18)") {
    // max() treats NaN as the largest double: without the guard the
    // span collapses to 1.0, real values pile into the clamped top
    // bin, NaN rows bin to 0, and a class-correlated NaN pattern
    // fabricates MI with no error
    val rows = (0 until 100).map { i =>
      val label = if (i % 2 == 0) "A" else "B"
      (label,
        if (label == "A" && i % 4 == 0) Double.NaN else i.toDouble,
        i.toDouble)
    }
    val df = rows.toDF("speaker", "nanny", "clean")
    val e = intercept[IllegalArgumentException] {
      new MiSelector().setFeatureCols(Array("nanny", "clean"))
        .setLabelCol("speaker").fit(df)
    }
    assert(e.getMessage.contains("nanny") && e.getMessage.contains("NaN"))
  }

  test("continuous/id-like label is rejected before the driver collect") {
    val df = (0 until 5000).map(i => (i.toDouble, i))
      .toDF("x", "id_label")
    val e = intercept[IllegalArgumentException] {
      new MiSelector().setFeatureCols(Array("x"))
        .setLabelCol("id_label").fit(df)
    }
    assert(e.getMessage.contains("categorical"))
  }

  test("MI score ordering: separating > noise, constant ≈ 0") {
    val rnd = new scala.util.Random(4)
    val rows = (0 until 2000).map { i =>
      val label = if (i % 2 == 0) "A" else "B"
      ((if (label == "A") 1.0 else -1.0) + 0.1 * rnd.nextGaussian(),
        rnd.nextGaussian(), 7.0, label)
    }
    val df = rows.toDF("good", "noise", "const", "speaker")
    val m = new MiSelector().setFeatureCols(Array("good", "noise", "const"))
      .setLabelCol("speaker").fit(df)
    val Array(miGood, miNoise, miConst) = m.getMiScores
    assert(miGood > miNoise && miGood > 0.5)
    assert(miConst < 0.01)
  }
}
