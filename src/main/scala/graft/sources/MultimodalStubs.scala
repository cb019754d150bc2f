package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.documents

/** Image/video multimodal operators: REAL Spark plumbing (schemas,
  * partitioning, per-partition batch shape) with STUBBED codecs.
  * NOTE: both real paths now exist — `ImageSource` decodes PNG/JPEG/BMP
  * through javax.imageio (nq_image_decode) and `VideoSource` decodes
  * MJPEG-in-AVI through a RIFF walk + javax.imageio per frame
  * (nq_video_frames). These stub variants are kept ONLY as documented
  * fallbacks for formats no JDK codec reads (e.g. H.264/VP9 video,
  * WebP images): swap the actual codec inside the same mapPartitions
  * boundary; every schema and shuffle stays identical.
  *
  * Contract (mirrors the audio path in MediaSource, which IS real):
  *   media row  = (id, content: binary, metadata...)
  *   decode     = mapPartitions, codec initialized once per partition
  *   features   = fixed-width numeric columns / arrays
  */
object MultimodalStubs {

  /** STUB image decode + resize + channel statistics.
    * Deterministic fake: "pixels" are a seeded stream derived from
    * xxhash64 of the content — byte-identical across runs/executors.
    */
  def imageFeatures(images: DataFrame, resizeTo: Int = 64): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = ImageIO/... initialized once here
        it.map { case (id, bytes) =>
          val seed = java.util.Arrays.hashCode(bytes).toLong
          val rnd = new java.util.Random(seed)
          val n = resizeTo * resizeTo
          var (r, g, b) = (0.0, 0.0, 0.0)
          var i = 0
          while (i < n) { // ??? real decode+resize goes here
            r += rnd.nextInt(256); g += rnd.nextInt(256); b += rnd.nextInt(256)
            i += 1
          }
          (id, resizeTo, resizeTo, r / n / 255.0, g / n / 255.0, b / n / 255.0)
        }
      }
      .toDF("image_id", "width", "height", "mean_r", "mean_g", "mean_b")
  }

  /** STUB video frame sampling (FALLBACK — the real path is
    * `VideoSource.sampleFrameFeatures`, which backs nq_video_frames):
    * emits one row per sampled frame with its timestamp — the
    * explode-shaped output a real frame sampler has. Kept for codecs
    * the JDK cannot decode.
    */
  def sampleFrames(videos: DataFrame, fps: Double = 1.0): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id").cast("long"), col("content"),
        col("duration_sec").cast("double"))
      .as[(Long, Array[Byte], Double)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, dur) =>
          val seed = java.util.Arrays.hashCode(bytes).toLong
          val nFrames = math.max(1, (dur * fps).toInt)
          (0 until nFrames).iterator.map { f =>
            val ts = f / fps
            // ??? real frame decode goes here; fake = content-keyed hash
            val frameSig = seed * 31 + f
            (id, f.toLong, ts, frameSig)
          }
        }
      }
      .toDF("video_id", "frame_idx", "frame_ts_sec", "frame_sig")
  }

  /** Driver-contract entries (rows-only): run the image/video plumbing
    * over binary fixtures derived deterministically from the documents
    * table (doc text bytes as opaque content, char count as duration) —
    * the stubs execute inside Verify/Bench, not only in specs. Swap in a
    * real codec and these queries are the production feature-extract
    * jobs unchanged.
    */
  def imageFeaturesQuery(s: SparkSession, d: String): DataFrame =
    imageFeatures(documents(s, d).select(col("doc_id").as("image_id"),
        encode(col("text"), "UTF-8").as("content")))
      .orderBy("image_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_image_features" -> (imageFeaturesQuery _))
}
