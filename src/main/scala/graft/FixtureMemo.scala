package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once memo for deterministic GENERATED media fixtures (the q81
  * store convention applied to inputs): the perceptual-dedup entries
  * synthesize their corpora (PNG render, MJPEG mux, PCM synth) — at
  * probe scale that encode dwarfs the operator under test, so a probe
  * that regenerates per run measures the fixture, not the operator
  * (nq_video_neardup's 250 s sf1f number in round 13 was ~90% MJPEG
  * encode). Generation is a pure function of its key (source dir /
  * clip count), so the first call materializes the corpus to a
  * temp parquet and every later call — same JVM, any session — reads
  * it back.
  *
  * Callers gate on [[Tables.isImmutable]] themselves where the key
  * includes a source dir: a mutable spec fixture dir rewritten in
  * place must always regenerate.
  */
object FixtureMemo {

  // key -> materialized parquet path (path, not DataFrame: valid
  // JVM-wide across sessions; the per-call read is footer-tax only)
  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def parquet(s: SparkSession, key: String)(build: => DataFrame)
      : DataFrame = {
    val path = memo.getOrElseUpdate(key, {
      val out = s"${scratchDir("graftfixture")}/fixture"
      build.write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  /** A temp dir cleaned up at JVM exit — the one create-then-walk-
    * reverse-delete recipe, shared with the entry-scoped store builders
    * (MediaDedupStore and friends) instead of re-inlined per caller. */
  private[graft] def scratchDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    p
  }
}
