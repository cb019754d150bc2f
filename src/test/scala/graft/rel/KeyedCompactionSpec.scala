package graft.rel

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Randomized invariant for the shared keyed compaction: for ANY
  * ingest/erasure history and any watermark, every read form (current
  * and as-of ≥ watermark) is IDENTICAL before and after
  * `compactThrough`, and a re-run is a no-op. Exercises the empty-fold
  * path, dropped-vs-kept tombstones, parallel copies across batches,
  * and sparse batch ids — the hand fixtures in GraphStoreSpec /
  * MediaDedupStoreSpec pin each path individually; this sweeps their
  * combinations. Trials are capped low (each runs many Spark jobs).
  */
object KeyedCompactionProps extends Properties("keyed-compaction") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = graft.TestSession.spark
  import spark.implicits._

  // small key space forces parallel copies + tombstone collisions
  private val edgeGen = Gen.listOfN(10,
    Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
  private val historyGen = for {
    nBatches <- Gen.choose(2, 4)
    batches <- Gen.listOfN(nBatches, edgeGen)
    dels <- Gen.listOfN(6, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    sparse <- Gen.oneOf(1L, 3L) // batch-id stride: contiguous or sparse
    through <- Gen.choose(0, nBatches - 1)
  } yield (batches, dels, sparse, through)

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  property("reads identical before/after compaction; re-run no-op") =
    forAll(historyGen) { case (batches, dels, sparse, throughIdx) =>
      val dir = java.nio.file.Files.createTempDirectory("kcprop")
      try {
        val store = dir.resolve("g").toString
        batches.zipWithIndex.foreach { case (es, i) =>
          GraphStore.applyEdgeBatch(
            es.toDF("src", "dst"), store, i.toLong * sparse)
        }
        if (dels.nonEmpty)
          GraphStore.deleteEdges(dels.toDF("src", "dst"), store, 0L)
        val ids = batches.indices.map(_.toLong * sparse)
        val through = ids(throughIdx)
        // every read form at or above the watermark, before the fold
        val before = (ids.filter(_ >= through).map(Some(_)) :+ None)
          .map(asOf => asOf -> edgeSet(
            GraphStore.edgesFromStore(spark, store, asOf)))
        GraphStore.compactThrough(spark, store, through)
        val after1 = before.forall { case (asOf, want) =>
          edgeSet(GraphStore.edgesFromStore(spark, store, asOf)) == want
        }
        GraphStore.compactThrough(spark, store, through) // re-run
        val after2 = before.forall { case (asOf, want) =>
          edgeSet(GraphStore.edgesFromStore(spark, store, asOf)) == want
        }
        // folded region really pruned: nothing below the watermark
        val parts = new java.io.File(s"$store/edges").listFiles()
          .map(_.getName).filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong)
        after1 && after2 && parts.forall(_ >= through)
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
}
