package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NswKnn: recall vs the exact q30 top-k, byte-stable determinism
  * under input relayout, intra-shard graph integrity, and the
  * per-query candidate bound that justifies the walk (≤ P·ef visits,
  * independent of n).
  */
class NswKnnSpec extends SparkSpec {

  test("recall vs exact top-5 on the test embeddings") {
    val approx = NswKnn.nswKnn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = SimQueries.q30KnnExact(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = approx.count { case (q, n) => byQ(q).contains(n) }
    val recall = hits.toDouble / exact.length
    assert(recall >= 0.85, s"recall $recall (${hits}/${exact.length})")
  }

  test("graph and results are byte-stable under input relayout") {
    val a = NswKnn.nswKnn(spark, sf0001).collect().map(_.toSeq)
    val b = NswKnn.nswKnn(spark, sf0001).collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq === b.toSeq)
    // the graph itself: same edges regardless of run
    val g1 = NswKnn.buildGraph(spark, sf0001)
      .select("vec_id", "neighbors").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val g2 = NswKnn.buildGraph(spark, sf0001)
      .select("vec_id", "neighbors").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(g1.nonEmpty && g1.toSeq === g2.toSeq)
  }

  test("graph integrity: intra-shard edges, bounded degree, connectivity seed") {
    val g = NswKnn.buildGraph(spark, sf0001, nShards = 4, m = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](4)))
    val shardOf = g.map(r => r._2 -> r._1).toMap
    g.foreach { case (shard, id, nbs) =>
      assert(nbs.forall(shardOf(_) == shard), s"edge leaves shard of $id")
      assert(!nbs.contains(id), "self loop")
      assert(nbs.length <= 16, s"degree ${nbs.length} > 2m")
      assert(nbs.distinct.length == nbs.length, "duplicate edge")
    }
    // every non-first node of a shard has at least one edge (insertion
    // connects it), so no stranded nodes beyond the entry
    val stranded = g.groupBy(_._1).map { case (_, rows) =>
      rows.sortBy(_._2).drop(1).count(_._3.isEmpty)
    }.sum
    assert(stranded === 0)
  }

  test("stored-graph search equals the in-query build exactly") {
    val dir = java.nio.file.Files.createTempDirectory("nswsp").toString
    NswKnn.writeGraph(spark, sf0001, s"$dir/g.parquet")
    val stored = NswKnn.nswKnnStored(spark, sf0001, s"$dir/g.parquet")
      .collect().map(_.toSeq)
    val direct = NswKnn.nswKnn(spark, sf0001).collect().map(_.toSeq)
    assert(stored.nonEmpty && stored.toSeq === direct.toSeq)
  }

  test("per-query candidate volume is bounded by shards × ef, not n") {
    // dumps redirected to a private dir: this JVM must never write the
    // fixed /tmp dump root a concurrently-running Verify may own
    val dumpDir = java.nio.file.Files
      .createTempDirectory("nswdump").toString
    System.setProperty(graft.OracleDump.Enabled, "true")
    System.setProperty("graft.oracle.dump.dir", dumpDir)
    try {
      NswKnn.nswKnn(spark, sf0001, nShards = 4, efS = 32).collect()
      val dumped = spark.read.parquet(s"$dumpDir/nq_nsw_knn.parquet")
      val worst = dumped.groupBy("query_id").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(worst <= 4L * 32, s"candidates per query $worst > P*ef")
    } finally {
      System.clearProperty(graft.OracleDump.Enabled)
      System.clearProperty("graft.oracle.dump.dir")
    }
  }

  test("graph store delete: tombstoned nodes never returned; compact " +
      "rebuilds only the affected shards and removes them physically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nsw-del")
    try {
      val path = s"$dir/graph.parquet"
      NswKnn.writeGraph(spark, sf0001, path)
      def results() = NswKnn.nswKnnStored(spark, sf0001, path).collect()
      val before = results()
      val victims = before.filter(_.getAs[Long]("query_id") == 0L)
        .map(_.getAs[Long]("neighbor_id")).filter(_ >= 10L).toSeq
      assert(victims.nonEmpty)
      val victimShards = spark.read.parquet(path)
        .filter($"vec_id".isin(victims: _*))
        .select($"shard".cast("int")).distinct().as[Int].collect().toSet
      def shardFiles(sh: Int): Set[String] = {
        val d = java.nio.file.Paths.get(path, s"shard=$sh")
        import scala.jdk.CollectionConverters._
        if (!java.nio.file.Files.exists(d)) Set.empty
        else java.nio.file.Files.list(d).iterator().asScala
          .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
      }
      val untouched = (0 until 4).toSet -- victimShards
      val filesBefore = untouched.map(sh => sh -> shardFiles(sh)).toMap
      NswKnn.deleteFromGraphStore(victims.toDF("vec_id"), path, 0L)
      val after = results()
      assert(!after.exists(r => victims.contains(
          r.getAs[Long]("neighbor_id"))),
        "a tombstoned node must never be returned")
      assert(after.groupBy(_.getAs[Long]("query_id")).forall(_._2.length == 5),
        "candidate-stage exclusion must keep the returned top-k full")
      NswKnn.compactGraphStore(spark, path)
      val afterC = results()
      assert(!afterC.exists(r => victims.contains(
          r.getAs[Long]("neighbor_id"))),
        "deletion must survive compaction")
      assert(spark.read.parquet(path)
        .filter($"vec_id".isin(victims: _*)).count() === 0L,
        "compact must remove tombstoned rows physically")
      untouched.foreach { sh =>
        assert(shardFiles(sh) === filesBefore(sh),
          s"shard $sh holds no victim — compact must not rewrite it")
      }
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
          graft.rel.Tombstones.logPath(path))),
        "compact must truncate the tombstone log")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("graph compaction is staged durably: an interrupted run (stage " +
      "written, store untouched, log standing) replays from DISK on " +
      "the next entry and lands the identical store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nsw-stage")
    try {
      val path = s"$dir/graph.parquet"
      val twin = s"$dir/twin.parquet"
      NswKnn.writeGraph(spark, sf0001, path)
      NswKnn.writeGraph(spark, sf0001, twin)
      val victims = spark.read.parquet(path)
        .select("vec_id").as[Long].collect().filter(_ % 17 == 3).toSeq
      assert(victims.nonEmpty)
      NswKnn.deleteFromGraphStore(victims.toDF("vec_id"), path, 0L)
      NswKnn.deleteFromGraphStore(victims.toDF("vec_id"), twin, 0L)
      // run the twin's compaction to completion — the expected state
      NswKnn.compactGraphStore(spark, twin)
      // the interrupt: stage through the op's own first half, stop
      // before applying (the crash) — store untouched, log standing,
      // stage complete on disk
      val stage = s"${path}_compact_stage"
      assert(NswKnn.stageGraphCompaction(spark, path))
      assert(new java.io.File(stage).exists())
      assert(spark.read.parquet(path)
        .filter($"vec_id".isin(victims: _*)).count() > 0L)
      // re-entry replays the stage from disk
      NswKnn.compactGraphStore(spark, path)
      assert(spark.read.parquet(path)
        .filter($"vec_id".isin(victims: _*)).count() === 0L)
      assert(!new java.io.File(stage).exists())
      val a = NswKnn.nswKnnStored(spark, sf0001, path)
        .collect().map(_.toSeq).toSeq
      val b = NswKnn.nswKnnStored(spark, sf0001, twin)
        .collect().map(_.toSeq).toSeq
      assert(a === b, "staged replay must land the twin's exact store")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
