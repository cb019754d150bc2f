package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted link-graph store: edges ingested as fenced `batch_id=N`
  * partitions (the AggStore layout), an edge-level tombstone log for
  * keyed deletion (a retracted page's outlinks must leave the graph —
  * the link analogue of the round-11 GDPR surface), and graph
  * operators ([[PageRank]], [[Hits]], [[LabelProp]], [[Triangles]])
  * running off the store read. The web-curation shape: crawls arrive
  * incrementally, the host graph is an accumulated artifact, and
  * centrality is recomputed from the CURRENT graph — PageRank is not
  * incrementally maintainable exactly (a single edge can move every
  * rank), so the honest contract is store-maintenance + recompute,
  * never a stale-rank patch.
  *
  * Read semantics follow the store family: `asOfBatch` rewinds the
  * DATA timeline (partition-pruned `batch_id <= k`), while edge
  * tombstones apply to EVERY read — an erasure is not rewindable
  * ([[AggStore.aggFromStoreAsOf]]'s documented convention).
  * Redelivery of an edge batch or a delete batch is a no-op by the
  * usual dynamic-partition-overwrite fence.
  */
object GraphStore {

  private def tombDir(storePath: String) = s"$storePath/_edge_tombstones"
  private def dataDir(storePath: String) = s"$storePath/edges"

  /** Ingest one edge batch under its own fenced partition. */
  def applyEdgeBatch(edges: DataFrame, storePath: String,
      batchId: Long): Unit =
    edges.select(col("src"), col("dst"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite").parquet(dataDir(storePath))

  /** Keyed edge deletion: (src, dst) pairs land in the tombstone log
    * under their own fenced partition; every read anti-joins them.
    * Deleting a pair removes ALL its copies (parallel edges included),
    * in every batch, at every as-of. */
  def deleteEdges(pairs: DataFrame, storePath: String,
      batchId: Long): Unit =
    pairs.select(col("src"), col("dst"))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1).write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite").parquet(tombDir(storePath))

  /** The current (or as-of) edge set: batches ≤ k minus tombstones.
    * The tombstone side is tiny relative to the graph (deletions are
    * exceptional) — broadcast anti-join, no shuffle of the edge set. */
  def edgesFromStore(s: SparkSession, storePath: String,
      asOfBatch: Option[Long] = None): DataFrame = {
    val data = CardinalityStore.asOf(
      s.read.parquet(dataDir(storePath)), asOfBatch)
    val p = new org.apache.hadoop.fs.Path(tombDir(storePath))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) data.select("src", "dst")
    else data.join(
        broadcast(s.read.parquet(tombDir(storePath))
          .select(col("src").as("ts"), col("dst").as("td")).distinct()),
        col("src") === col("ts") && col("dst") === col("td"),
        "left_anti")
      .select("src", "dst")
  }

  // ----------------------------------------------------- nq_graph_store
  // one store build per immutable driver dir (the q81 memo policy)
  private val storeFor =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Driver entry: the citation graph arrives as 3 ingest batches
    * (src mod 3), then ONE edge-deletion batch removes every edge with
    * (src + dst) ≡ 5 (mod 31) (~3%), and PageRank runs off the store
    * read. The oracle replays the recurrence over the citation edges
    * with the SAME deletion predicate applied as a WHERE — a
    * tombstone miss, a batch leak, or a surviving deleted edge all
    * hash-fail through the rank vector. */
  def nqGraphStore(s: SparkSession, d: String): DataFrame = {
    def build(): String = {
      val p = java.nio.file.Files.createTempDirectory("graphstore")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      val path = s"$p/graph"
      val e = PageRank.citationEdges(s, d)
      (0 until 3).foreach(b => applyEdgeBatch(
        e.filter(pmod(col("src"), lit(3)) === b), path, b.toLong))
      deleteEdges(
        e.filter(pmod(col("src") + col("dst"), lit(31)) === 5), path, 0L)
      path
    }
    val store = if (graft.Tables.isImmutable(d))
      storeFor.getOrElseUpdate(d, build())
    else build()
    val docs = graft.Tables.documents(s, d)
    PageRank.pageRank(edgesFromStore(s, store), iters = 5,
        nodes = Some(docs.select(col("doc_id"))))
      .select(col("id").as("doc_id"), round(col("r"), 6).as("pr"))
      .orderBy("doc_id")
  }

  /** q101's unrolled oracle over the post-deletion edge set. */
  private[rel] def nqGraphStoreSql: String = {
    val iters = (1 to 5).map { k =>
      val p = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT nodes.id,
         |    0.15 / n.nn + 0.85 * (COALESCE(c.s, 0)
         |      + (SELECT COALESCE(sum(p.r), 0) FROM $p p
         |         LEFT JOIN outdeg o ON p.id = o.src
         |         WHERE o.src IS NULL) / n.nn) AS r
         |  FROM nodes CROSS JOIN n
         |  LEFT JOIN (SELECT e.dst AS id, sum(p.r / o.deg) AS s
         |             FROM kept e JOIN $p p ON e.src = p.id
         |             JOIN outdeg o ON o.src = e.src
         |             GROUP BY e.dst) c ON c.id = nodes.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${PageRank.citationEdgesSql},
       |kept AS MATERIALIZED (
       |  SELECT src, dst FROM edges WHERE (src + dst) % 31 <> 5),
       |outdeg AS (SELECT src, count(*) AS deg FROM kept GROUP BY src),
       |r0 AS (SELECT id, 1.0 / nn AS r FROM nodes CROSS JOIN n),
       |$iters
       |SELECT id AS doc_id, round(r, 6) AS pr FROM r5
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_graph_store" -> (nqGraphStore _))

  val oracle: Map[String, String] = Map(
    "nq_graph_store" -> nqGraphStoreSql)
}
