package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min's contract: estimates never undercount (one-sided error),
  * the error stays inside the (e/width)·N band, merging per-batch
  * sketches is EXACT (cell-wise sums — any batch split yields the
  * monolithic sketch bit-for-bit), the persisted store answers like the
  * direct sketch with byte-idempotent redelivery, streaming ingest
  * lands the same store, and absent cells read as zero.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def ev = graft.Tables.events(spark, sf0001)

  private def truth: Map[Long, Long] =
    ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap

  test("estimates never undercount and stay in the (e/width)*N band") {
    val n = ev.count()
    val est = Cms.estimate(Cms.cmsOf(ev, "user_id"), ev, "user_id")
      .as[(Long, Long)].collect().toMap
    val t = truth
    assert(est.keySet == t.keySet)
    val eps = math.exp(1.0) / Cms.Width
    var over = 0
    t.foreach { case (u, cnt) =>
      assert(est(u) >= cnt, s"user $u: est ${est(u)} undercounts $cnt")
      if (est(u) - cnt > eps * n) over += 1
    }
    // per-probe failure probability is e^-depth ≈ 0.018; with 150
    // probes and a fixed seed, a handful of band misses is the
    // expected ceiling, a systematic breach is a bug
    assert(over <= math.max(3, (0.05 * t.size).toInt),
      s"$over of ${t.size} probes exceed the CMS error band")
  }

  test("any batch split merges to the monolithic sketch bit-for-bit") {
    def viaBatches(n: Int) = Cms.merge(
        (0 until n).map(b => Cms.cmsOf(
          ev.filter(pmod($"event_id", lit(n)) === b), "user_id"))
          .reduce(_ unionAll _))
      .orderBy("d", "bucket").collect().map(_.toSeq).toSeq
    val mono = Cms.cmsOf(ev, "user_id")
      .orderBy("d", "bucket").collect().map(_.toSeq).toSeq
    assert(viaBatches(2) === mono && viaBatches(7) === mono)
  }

  test("store path: persist, merge, idempotent redelivery") {
    val dir = java.nio.file.Files.createTempDirectory("cmsstore")
    try {
      val store = dir.resolve("store.parquet").toString
      val b0 = ev.filter(pmod($"event_id", lit(2)) === 0)
      val b1 = ev.filter(pmod($"event_id", lit(2)) === 1)
      Cms.applyBatch(b0, "user_id", store, 0L)
      Cms.applyBatch(b1, "user_id", store, 1L)
      val direct = Cms.estimate(Cms.cmsOf(ev, "user_id"), ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val stored = Cms.estimateFromStore(spark, store, ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(stored === direct,
        "store-merged estimates must equal the direct sketch's")
      def nFiles = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .count(p => p.toString.endsWith(".parquet") &&
            java.nio.file.Files.isRegularFile(p))
      }
      val filesBefore = nFiles
      Cms.applyBatch(b1, "user_id", store, 1L)
      val redelivered = Cms.estimateFromStore(spark, store, ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(redelivered === stored, "redelivery must not move any estimate")
      assert(nFiles === filesBefore, "redelivery must not grow the store")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("streaming ingest lands the same store as the batch loop") {
    val dir = java.nio.file.Files.createTempDirectory("cmsstream")
    try {
      val store = dir.resolve("store.parquet").toString
      val rows = ev.select("event_id", "user_id")
        .as[(Long, Long)].collect()
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      val q = Cms.cmsIngestStream(
          stream.toDF.toDF("event_id", "user_id"), "user_id", store)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      stream.addData(rows.filter(_._1 % 2 == 0).toIndexedSeq)
      q.processAllAvailable()
      stream.addData(rows.filter(_._1 % 2 == 1).toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      val streamed = Cms.estimateFromStore(spark, store, ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val direct = Cms.estimate(Cms.cmsOf(ev, "user_id"), ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(streamed === direct,
        "streamed store must estimate identically to the direct sketch")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("horizontal compaction: estimates bit-identical (cell-wise sums " +
      "are exact), retractions fold with their signs, originals prune, " +
      "as-of and ingest both guarded at the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("cmscompact")
    try {
      val store = dir.resolve("store").toString
      def slice(b: Int) = ev.filter(pmod($"event_id", lit(3)) === b)
      (0 until 3).foreach(b =>
        Cms.applyBatch(slice(b), "user_id", store, b.toLong))
      // a retraction inside the fold region: its negated counters must
      // net into the fold exactly
      Cms.retractBatch(slice(0).filter($"user_id" % 2 === 0),
        "user_id", store, 3L)
      def est(asOf: Option[Long] = None) = Cms.estimateFromStore(
          spark, store, ev, "user_id", asOfBatch = asOf)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val before = est()
      Cms.compactThrough(spark, store, 3L)
      val parts = spark.read.parquet(store)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(parts === Set(3L), s"got $parts")
      assert(est() === before, "cell-wise sums make the fold exact")
      val e = intercept[IllegalArgumentException](est(Some(2L)))
      assert(e.getMessage.contains("fold watermark 3"), e.getMessage)
      // counters are additive: replaying either batch KIND at/below
      // the watermark would double-count / double-subtract — refused
      val e2 = intercept[IllegalArgumentException](
        Cms.applyBatch(slice(0), "user_id", store, 0L))
      assert(e2.getMessage.contains("replay horizon"), e2.getMessage)
      intercept[IllegalArgumentException](
        Cms.retractBatch(slice(0), "user_id", store, 3L))
      // fresh ids above the watermark land normally
      Cms.applyBatch(slice(0), "user_id", store, 4L)
      assert(est() !== before)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("a key whose cells are all absent estimates zero") {
    val one = Seq(Tuple1(7L)).toDF("k")
    val probe = Seq(Tuple1(123456789L)).toDF("k")
    val est = Cms.estimate(Cms.cmsOf(one, "k"), probe, "k")
      .as[(Long, Long)].collect().toMap
    // 4 occupied cells out of 4096: the foreign probe's cells are
    // empty (deterministic for these fixed keys) → implicit zero
    assert(est(123456789L) == 0L)
  }

  test("parameter guards fail loudly") {
    intercept[IllegalArgumentException] {
      Cms.cmsOf(ev, "user_id", width = 1000) // not a power of two
    }
    intercept[IllegalArgumentException] {
      Cms.cmsOf(ev, "user_id", depth = 0)
    }
  }

  test("retraction: merged store equals the survivors' sketch " +
      "bit-for-bit; replay a no-op; one-sided bound holds on survivors") {
    val deleted = pmod($"event_id", lit(17)) === 3
    val dir = java.nio.file.Files.createTempDirectory("cms-retract")
    try {
      val store = dir.resolve("store.parquet").toString
      Cms.applyBatch(ev, "user_id", store, 0L)
      Cms.retractBatch(ev.filter(deleted), "user_id", store, 1L)
      def stored = Cms.merge(
          spark.read.parquet(store).drop("batch_id"))
        .orderBy("d", "bucket").collect().map(_.toSeq).toSeq
      val netted = stored
      val survivorsSketch = Cms.cmsOf(ev.filter(!deleted), "user_id")
        .orderBy("d", "bucket").collect().map(_.toSeq).toSeq
      // cells netted to zero stay as explicit zero rows in the merge;
      // the survivors' sketch omits them — compare on nonzero cells
      assert(netted.filter(_.last != 0L) === survivorsSketch,
        "negated counters must net the deleted slice out exactly")
      Cms.retractBatch(ev.filter(deleted), "user_id", store, 1L)
      assert(stored === netted, "replayed retraction must not move answers")
      // est >= true frequency of the surviving multiset, for every key
      val truth = ev.filter(!deleted).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val est = Cms.estimateFromStore(spark, store, ev, "user_id")
      val under = est.join(truth, Seq("user_id"))
        .filter($"est" < $"n").count()
      assert(under === 0L,
        "genuine deletes must preserve the one-sided estimate contract")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("as-of read: snapshot estimates equal a sketch over batches 0..k " +
      "(additive counters, so the snapshot is the exact partial sum)") {
    val dir = java.nio.file.Files.createTempDirectory("cmsasof")
    try {
      val store = dir.resolve("store.parquet").toString
      (0 until 3).foreach(b => Cms.applyBatch(
        ev.filter(pmod($"event_id", lit(3)) === b), "user_id", store,
        b.toLong))
      val asOf = Cms.estimateFromStore(spark, store, ev, "user_id",
          asOfBatch = Some(1L))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val truth = Cms.estimate(
          Cms.cmsOf(ev.filter(pmod($"event_id", lit(3)) <= 1), "user_id"),
          ev, "user_id")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(asOf.nonEmpty && asOf === truth)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

}
