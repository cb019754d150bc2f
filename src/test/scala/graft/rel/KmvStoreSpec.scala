package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KmvStore: the exactness claim that distinguishes the KMV store from
  * the HLL one — merged per-batch sketches EQUAL the monolithic sketch
  * (not just its estimate) under any batch split; replay idempotence on
  * both estimates and store size; and store-derived intersections equal
  * the direct computation.
  */
class KmvStoreSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def hashed = graft.Tables.events(spark, sf0001)
    .select(col("event_id"), col("event_type"),
      xxhash64(col("user_id"), lit(42L)).as("h"))

  private def collectSketches(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1))).toSeq

  test("merged per-batch sketches EQUAL the monolithic sketch, any split") {
    val mono = collectSketches(
      KmvStore.sketchBatch(hashed, Seq("event_type"), "h", K))
    for (nBatches <- Seq(2, 5)) {
      val perBatch = (0 until nBatches).map(b =>
        KmvStore.sketchBatch(
          hashed.filter(pmod(col("event_id"), lit(nBatches)) === b),
          Seq("event_type"), "h", K))
      val merged = collectSketches(
        KmvStore.mergeSketches(perBatch.reduce(_ unionAll _),
          Seq("event_type"), K))
      assert(merged === mono, s"split into $nBatches batches")
    }
  }

  test("redelivered batch: no-op on sketches AND on store size") {
    val dir = java.nio.file.Files.createTempDirectory("kmvsp").toString
    val path = s"$dir/kmv.parquet"
    (0 until 3).foreach { b =>
      KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(3)) === b),
        Seq("event_type"), "h", path, b.toLong, K)
    }
    val before = collectSketches(
      KmvStore.sketchesFromStore(spark, path, Seq("event_type"), K))
    def nFiles = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val filesBefore = nFiles
    // redeliver batch 1 (at-least-once recovery)
    KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(3)) === 1),
      Seq("event_type"), "h", path, 1L, K)
    val after = collectSketches(
      KmvStore.sketchesFromStore(spark, path, Seq("event_type"), K))
    assert(after === before)
    assert(nFiles === filesBefore, "dynamic overwrite keeps size stable")
  }

  test("horizontal compaction: merged sketches EXACTLY equal (min-k " +
      "union is fold-structure-free), originals prune, as-of guarded") {
    val dir = java.nio.file.Files.createTempDirectory("kmvcompact").toString
    val path = s"$dir/kmv.parquet"
    (0 until 4).foreach { b =>
      KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(4)) === b),
        Seq("event_type"), "h", path, b.toLong, K)
    }
    def merged(asOf: Option[Long] = None) = collectSketches(
      KmvStore.sketchesFromStore(spark, path, Seq("event_type"), K, asOf))
    val before = merged()
    val asOf1Before = merged(Some(1L))
    KmvStore.compactThrough(spark, path, Seq("event_type"), K, 1L)
    val parts = spark.read.parquet(path)
      .select("batch_id").distinct().as[Long].collect().toSet
    assert(parts === Set(1L, 2L, 3L), s"got $parts")
    // the k smallest distinct hashes are a pure function of the input
    // SET — the folded store's sketches equal the originals' exactly
    assert(merged() === before)
    assert(merged(Some(1L)) === asOf1Before)
    val e = intercept[IllegalArgumentException](merged(Some(0L)))
    assert(e.getMessage.contains("fold watermark 1"), e.getMessage)
    // re-run: the fold of the fold is itself
    KmvStore.compactThrough(spark, path, Seq("event_type"), K, 1L)
    assert(merged() === before)
    // ingest replay horizon (r18): a redelivery AT the watermark
    // would overwrite the fold partition with one batch's k-mins —
    // refused, as is strictly-below; the gated-fold rebuild at ==
    // (applyBatch under a gate, then ungate) is the one exception
    val atFold = intercept[IllegalArgumentException](
      KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(4)) === 1),
        Seq("event_type"), "h", path, 1L, K))
    assert(atFold.getMessage.contains("fold watermark 1"),
      atFold.getMessage)
    intercept[IllegalArgumentException](
      KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(4)) === 0),
        Seq("event_type"), "h", path, 0L, K))
    assert(merged() === before, "refused ingests must not move answers")
    Tombstones.gateBatches(spark, path, Seq(1L), 0L)
    KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(4)) <= 1),
      Seq("event_type"), "h", path, 1L, K)
    Tombstones.ungateBatch(spark, path, 1L)
    assert(merged() === before,
      "rebuild from the fold's own raw input must reproduce the store")
  }

  test("store-derived intersections equal the direct computation") {
    val dir = java.nio.file.Files.createTempDirectory("kmvsp2").toString
    val path = s"$dir/kmv.parquet"
    (0 until 4).foreach { b =>
      KmvStore.applyBatch(hashed.filter(pmod(col("event_id"), lit(4)) === b),
        Seq("event_type"), "h", path, b.toLong, K)
    }
    val fromStore = ApproxQueries.intersectSketches(
        KmvStore.sketchesFromStore(spark, path, Seq("event_type"), K),
        "event_type", K, "type_a", "type_b", "est")
      .collect().map(_.toSeq)
    val direct = ApproxQueries.intersectSketches(
        KmvStore.sketchBatch(hashed, Seq("event_type"), "h", K),
        "event_type", K, "type_a", "type_b", "est")
      .collect().map(_.toSeq)
    assert(fromStore.nonEmpty && fromStore.toSeq === direct.toSeq)
  }

  test("streaming ingest maintains the store; sketches equal monolithic") {
    val dir = java.nio.file.Files.createTempDirectory("kmvstream")
    try {
      val src = dir.resolve("src"); java.nio.file.Files.createDirectory(src)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        src.resolve("events.parquet"))
      val store = dir.resolve("store.parquet").toString
      val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
      val stream = spark.readStream.schema(schema).parquet(src.toString)
        .select(col("event_type"),
          xxhash64(col("user_id"), lit(42L)).as("h"))
      val q = KmvStore.kmvStream(stream, Seq("event_type"), "h", store, K)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = collectSketches(
        KmvStore.sketchesFromStore(spark, store, Seq("event_type"), K))
      val mono = collectSketches(
        KmvStore.sketchBatch(hashed, Seq("event_type"), "h", K))
      assert(streamed.nonEmpty && streamed === mono)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("intersection estimates land near truth on the events corpus") {
    val est = KmvStore.nqKmvStore(spark, sf0001, k = K)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ev = graft.Tables.events(spark, sf0001)
      .select("event_type", "user_id").distinct()
    val truth = ev.as("a")
      .join(ev.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(est.nonEmpty)
    est.foreach { case (pair, e) =>
      val t = truth.getOrElse(pair, 0L).toDouble
      // k=64 → RSE ≈ 1/√62 ≈ 13% on the union scale; the intersection
      // inherits extra variance — assert a generous 4σ-ish envelope
      // plus an absolute floor for tiny overlaps
      assert(math.abs(e - t) <= math.max(0.6 * math.max(t, 1.0), 15.0),
        s"$pair est=$e truth=$t")
    }
  }

  test("as-of read: the snapshot sketch EQUALS the batches-0..k sketch " +
      "(KMV merge is exact, so as-of is exact too)") {
    val dir = java.nio.file.Files.createTempDirectory("kmvasof")
    try {
      val path = dir.resolve("store").toString
      (0 until 3).foreach(b => KmvStore.applyBatch(
        hashed.filter(pmod(col("event_id"), lit(3)) === b),
        Seq("event_type"), "h", path, b.toLong, K))
      val asOf = collectSketches(KmvStore.sketchesFromStore(
        spark, path, Seq("event_type"), K, asOfBatch = Some(1L)))
      val truth = collectSketches(KmvStore.sketchBatch(
        hashed.filter(pmod(col("event_id"), lit(3)) <= 1),
        Seq("event_type"), "h", K))
      assert(asOf.nonEmpty && asOf === truth)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

}
