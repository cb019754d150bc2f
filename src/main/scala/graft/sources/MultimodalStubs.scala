package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** STUB image decode + resize + channel statistics (FALLBACK — the
    * real path is `ImageSource.decodeImageFeatures`, which backs both
    * nq_image_decode and nq_image_features): deterministic fake whose
    * "pixels" are a seeded stream derived from a hash of the content —
    * byte-identical across runs/executors. Kept ONLY for codecs
    * javax.imageio cannot read (e.g. WebP/AVIF); swap the codec inside
    * the same mapPartitions boundary and the plumbing is unchanged.
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

  /** No driver-contract entries remain here: nq_image_features moved to
    * the real decoder (`ImageSource.imageFeaturesQuery`) and
    * nq_video_frames has always been `VideoSource`'s. Both stubs above
    * stay as spec-covered documented fallbacks for non-JDK codecs.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}
