package graft

/** The durability flag: `Checkpointing.truncate` must write reliable,
  * executor-loss-surviving checkpoints when the session has a checkpoint
  * dir (the cluster deployment mode) and fall back to localCheckpoint
  * when it doesn't — with identical results either way, exercised
  * through the iterative operator that depends on truncation the most
  * (connected components).
  */
class CheckpointingSpec extends SparkSpec {
  import spark.implicits._

  test("reliable mode engages via the session checkpoint dir and matches local mode") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("d1", "d2")
    def run(): Set[(Long, Long)] =
      graft.text.DedupClusters.connectedComponents(nodes, pairs)
        .as[(Long, Long)].collect().toSet
    val expected = Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L))

    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "suite precondition: no checkpoint dir set")
    assert(run() === expected) // local mode

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      assert(run() === expected, "reliable mode changed the answer")
      // and the mode switch was real: blocks landed in the dir
      import scala.jdk.CollectionConverters._
      val written = java.nio.file.Files.walk(dir).iterator().asScala
        .count(java.nio.file.Files.isRegularFile(_))
      assert(written > 0, "no files under the checkpoint dir — " +
        "truncate() did not take the reliable path")
    } finally {
      // restore local mode for the rest of the shared-session suite.
      // SparkContext has no public unset; private[spark] members are
      // public in bytecode, so the generated setter is callable —
      // confirmed below by getCheckpointDir reading back empty.
      classOf[org.apache.spark.SparkContext]
        .getMethod("checkpointDir_$eq", classOf[Option[String]])
        .invoke(spark.sparkContext, None)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "failed to restore local-checkpoint mode — later suites would " +
        "silently run in reliable mode against a deleted dir")
  }
}
