package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real JDK-codec image path: known-color PNGs must decode to exact
  * channel means at any input size (resize invariance for solid
  * colors), histograms must conserve pixels, corrupt bytes must yield a
  * null-feature verdict row, and the whole path must be deterministic.
  */
class ImageSourceSpec extends SparkSpec {
  import spark.implicits._

  private def solidPng(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("solid-color PNGs decode to exact channel means at any size") {
    val images = Seq(
      (1L, solidPng(0x336699, 40, 20)),
      (2L, solidPng(0x336699, 7, 130)), // resize-invariant for solids
      (3L, solidPng(0xFF0000, 32, 32)))
      .toDF("image_id", "content")
    val rows = ImageSource.decodeImageFeatures(images)
      .select("image_id", "decoded", "width", "height",
        "mean_r", "mean_g", "mean_b")
      .as[(Long, Boolean, Int, Int, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq ===
      Seq((1L, true, 40, 20), (2L, true, 7, 130), (3L, true, 32, 32)))
    for (r <- rows.take(2)) {
      assert(math.abs(r._5 - 0x33 / 255.0) < 1e-4, s"mean_r ${r._5}")
      assert(math.abs(r._6 - 0x66 / 255.0) < 1e-4, s"mean_g ${r._6}")
      assert(math.abs(r._7 - 0x99 / 255.0) < 1e-4, s"mean_b ${r._7}")
    }
    assert(math.abs(rows(2)._5 - 1.0) < 1e-4)
    assert(rows(2)._6 === 0.0 && rows(2)._7 === 0.0)
  }

  test("luminance histogram conserves the resized pixel count") {
    val images = Seq((1L, ImageSource.renderPng(7L, 60, 45)))
      .toDF("image_id", "content")
    val hist = ImageSource.decodeImageFeatures(images, resizeTo = 32)
      .select("luma_hist").as[Seq[Long]].head()
    assert(hist.length === 16)
    assert(hist.sum === 32L * 32)
  }

  test("corrupt bytes produce a decoded=false row with null features") {
    val images = Seq(
      (1L, Array[Byte](1, 2, 3, 4, 5)),
      (2L, solidPng(0x000000, 4, 4)))
      .toDF("image_id", "content")
    val rows = ImageSource.decodeImageFeatures(images)
      .select("image_id", "decoded", "width")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getBoolean(1) === false)
    assert(rows(0).isNullAt(2), "undecodable must carry null dims")
    assert(rows(1).getBoolean(1) === true)
  }

  test("the contract query is deterministic and decodes every generated image") {
    val a = ImageSource.imageDecodeQuery(spark, sf0001).collect()
    val b = ImageSource.imageDecodeQuery(spark, sf0001).collect()
    assert(a.sameElements(b))
    assert(a.length === graft.Tables.documents(spark, sf0001).count())
    assert(a.forall(_.getBoolean(1)), "every generated PNG must decode")
  }

  test("nq_image_features rides the REAL decoder: projection parity + true pixel means") {
    // parity: the contract entry must be exactly the narrow projection of
    // decodeImageFeatures at resize 64 — no stub in the loop
    val contract = ImageSource.imageFeaturesQuery(spark, sf0001).collect()
    val direct = ImageSource
      .decodeImageFeatures(ImageSource.generateImages(spark, sf0001), resizeTo = 64)
      .select("image_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy("image_id").collect()
    assert(contract.sameElements(direct))
    // ground truth: a known solid PNG through the same projection yields
    // its actual channel means — a content-hash fake cannot
    val solid = Seq((1L, solidPng(0x204080, 24, 24))).toDF("image_id", "content")
    val m = ImageSource.decodeImageFeatures(solid, resizeTo = 64)
      .select("mean_r", "mean_g", "mean_b")
      .as[(Double, Double, Double)].head()
    assert(math.abs(m._1 - 0x20 / 255.0) < 1e-4)
    assert(math.abs(m._2 - 0x40 / 255.0) < 1e-4)
    assert(math.abs(m._3 - 0x80 / 255.0) < 1e-4)
    // and the contract rows carry real decoded dims (generateImages'
    // doc-derived sizes), not the stub's resizeTo-constant dims
    assert(contract.exists(r => r.getInt(1) != r.getInt(2)),
      "real dims vary per doc; the stub reported resizeTo for both")
  }
}
