package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cardinality store's contract: batch sketches merge to EXACTLY the
  * monolithic sketch's estimate, the estimate is inside HLL's error band
  * against the exact distinct, redelivery is a no-op (register max is
  * idempotent), and a mixed-precision store fails loudly.
  */
class CardinalityStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ev = graft.Tables.events(spark, sf0001)

  test("merged per-batch sketches equal the monolithic sketch exactly") {
    val merged = CardinalityStore.mergedEstimates(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val mono = CardinalityStore.mergeSketches(
        CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id"),
        Seq("event_type"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(merged.nonEmpty && merged.sameElements(mono),
      "union of batch sketches must reproduce the full-corpus registers")
  }

  test("merged register array equals the monolithic sketch's registers") {
    val regs = udf((bytes: Array[Byte]) =>
      org.apache.datasketches.hll.GraftHllAccess.registerPairs(bytes))
    val merged = CardinalityStore.nqCardStore(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    val mono = CardinalityStore
      .sketchBatch(ev, Seq("event_type"), "user_id")
      .select($"event_type", explode(regs($"sketch")).as("p"))
      .select($"event_type", $"p._1", $"p._2")
      .orderBy("event_type", "p._1").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(merged.nonEmpty && merged === mono,
      "hll_union_agg must reproduce the full-corpus register array " +
        "slot for slot")
  }

  test("estimates stay within 5% of the exact distinct per group") {
    val est = CardinalityStore.mergedEstimates(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (g, n) =>
      val e = est(g)
      assert(math.abs(e - n).toDouble / n <= 0.05,
        s"group $g: est $e vs exact $n exceeds 5%")
    }
  }

  test("store path: append, merge, and idempotent redelivery") {
    val dir = java.nio.file.Files.createTempDirectory("cardstore")
    try {
      val store = dir.resolve("store.parquet").toString
      val b0 = ev.filter(pmod($"event_id", lit(2)) === 0)
      val b1 = ev.filter(pmod($"event_id", lit(2)) === 1)
      CardinalityStore.applyBatch(b0, Seq("event_type"), "user_id", store, 0L)
      CardinalityStore.applyBatch(b1, Seq("event_type"), "user_id", store, 1L)
      val two = CardinalityStore
        .estimateFromStore(spark, store, Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq)
      // redeliver batch 1 verbatim: registers already dominate it
      CardinalityStore.applyBatch(b1, Seq("event_type"), "user_id", store, 1L)
      val redelivered = CardinalityStore
        .estimateFromStore(spark, store, Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq)
      assert(two.nonEmpty && two.toSeq === redelivered.toSeq,
        "a redelivered batch must not move any estimate")
      // dynamic partition overwrite: the replay replaced its own
      // batch_id partition, so the store's SIZE is also unchanged — an
      // append here would grow rows/files per recovery forever
      assert(spark.read.parquet(store)
        .filter($"batch_id" === 1L).count() ===
        spark.read.parquet(store).filter($"batch_id" === 0L).count(),
        "a redelivered batch must not grow its partition")
      assert(spark.read.parquet(store).select("batch_id")
        .distinct().count() === 2)
      // and the store agrees with the no-store contract query shape
      val mono = CardinalityStore.mergeSketches(
          CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id"),
          Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq)
      assert(two.toSeq === mono.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("horizontal compaction: estimates identical before/after (same " +
      "registers), originals prune, as-of below the fold refuses, " +
      "re-run no-ops, and a gated fold region refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("cardcompact")
    try {
      val store = dir.resolve("store").toString
      def slice(b: Int) = ev.filter(pmod($"event_id", lit(5)) === b)
      (0 until 5).foreach(b => CardinalityStore.applyBatch(
        slice(b), Seq("event_type"), "user_id", store, b.toLong))
      def est(asOf: Option[Long] = None) = CardinalityStore
        .estimateFromStore(spark, store, Seq("event_type"), asOf)
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      def partitions = spark.read.parquet(store)
        .select("batch_id").distinct().as[Long].collect().toSet
      val before = est()
      val asOf2Before = est(Some(2L))
      CardinalityStore.compactThrough(spark, store, Seq("event_type"), 2L)
      assert(partitions === Set(2L, 3L, 4L), s"got $partitions")
      // register-wise union is exact: the folded store's registers ARE
      // the originals' max, so every estimate is bit-identical
      assert(est() === before)
      assert(est(Some(2L)) === asOf2Before,
        "as-of AT the watermark must survive")
      val e = intercept[IllegalArgumentException](est(Some(1L)))
      assert(e.getMessage.contains("fold watermark 2"), e.getMessage)
      // a re-run folds the fold into itself — a full no-op
      CardinalityStore.compactThrough(spark, store, Seq("event_type"), 2L)
      assert(partitions === Set(2L, 3L, 4L) && est() === before)
      // gates STRICTLY ABOVE `through` don't block; a gated batch in
      // the fold region refuses (folding would bake deleted keys in)
      Tombstones.gateBatches(spark, store, Seq(3L), 0L)
      CardinalityStore.compactThrough(spark, store, Seq("event_type"), 2L)
      val e2 = intercept[IllegalArgumentException](
        CardinalityStore.compactThrough(spark, store,
          Seq("event_type"), 4L))
      assert(e2.getMessage.contains("gated"), e2.getMessage)
      // rebuild + ungate lifts the refusal; the full fold then works
      // and serves the same estimates (nothing was actually deleted)
      CardinalityStore.rebuildBatch(slice(3), Seq("event_type"),
        "user_id", store, 3L)
      CardinalityStore.compactThrough(spark, store, Seq("event_type"), 4L)
      assert(partitions === Set(4L) && est() === before)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("streaming ingest maintains the store; estimates equal monolithic") {
    val dir = java.nio.file.Files.createTempDirectory("cardstream")
    try {
      // stage the events parquet as a file-stream backlog
      val src = dir.resolve("src"); java.nio.file.Files.createDirectory(src)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf0001/events.parquet"),
        src.resolve("events.parquet"))
      val store = dir.resolve("store.parquet").toString
      val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
      val stream = spark.readStream.schema(schema).parquet(src.toString)
      val q = CardinalityStore
        .cardinalityStream(stream, Seq("event_type"), "user_id", store)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = CardinalityStore
        .estimateFromStore(spark, store, Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq)
      val mono = CardinalityStore.mergeSketches(
          CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id"),
          Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq)
      assert(streamed.nonEmpty && streamed.toSeq === mono.toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("sketch build and merge both plan map-side partial aggregation") {
    // the mergeability story: per-batch sketching combines registers on
    // the map side (one tiny group-keyed shuffle), and the read-path
    // union re-merges store rows the same way — no formulation that
    // ships raw values to a reducer
    val sk = CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id")
    sk.collect()
    val skPlan = sk.queryExecution.executedPlan.toString
    assert(skPlan.contains("ObjectHashAggregate") &&
      skPlan.contains("partial_hll_sketch_agg"),
      s"sketch build must map-side combine:\n$skPlan")
    val mg = CardinalityStore.mergeSketches(sk, Seq("event_type"))
    mg.collect()
    val mgPlan = mg.queryExecution.executedPlan.toString
    assert(mgPlan.contains("partial_hll_union_agg"),
      s"merge must union registers map-side:\n$mgPlan")
  }

  test("mixed-lgK sketches fail loudly at merge, not silently degrade") {
    val a = CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id", 12)
    val b = CardinalityStore.sketchBatch(ev, Seq("event_type"), "user_id", 10)
    val e = intercept[Exception] {
      CardinalityStore.mergeSketches(a.unionAll(b), Seq("event_type")).collect()
    }
    assert(Option(e.getMessage).exists(m =>
      m.toLowerCase.contains("lgconfigk") || m.toLowerCase.contains("sketch")),
      s"expected an lgK-mismatch error, got: $e")
  }

  test("batch gate: delete(k) gates dirty batches out of every answer; " +
      "rebuild from raw-minus-k equals a store that never saw k") {
    // batches sliced by user id, so the victim's events live in exactly
    // one batch and the other four are clean and must stay un-gated
    // (the gate is surgical)
    val victim = ev.select("user_id").as[Long].head()
    def slice(b: Int) = ev.filter(pmod($"user_id", lit(5)) === b)
    val dirty = (0 until 5).filter(b =>
      slice(b).filter($"user_id" === victim).limit(1).count() > 0)
    assert(dirty.nonEmpty && dirty.size < 5,
      "fixture needs both dirty and clean batches")
    val dir = java.nio.file.Files.createTempDirectory("cardgate")
    try {
      val store = dir.resolve("store.parquet").toString
      val cleanStore = dir.resolve("never.parquet").toString
      (0 until 5).foreach { b =>
        CardinalityStore.applyBatch(slice(b), Seq("event_type"),
          "user_id", store, b.toLong)
        CardinalityStore.applyBatch(
          slice(b).filter($"user_id" =!= victim), Seq("event_type"),
          "user_id", cleanStore, b.toLong)
      }
      def est(p: String) = CardinalityStore
        .estimateFromStore(spark, p, Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      val full = est(store)
      Tombstones.gateBatches(spark, store, dirty.map(_.toLong), 0L)
      // gated read = merge over the clean batches only
      val cleanOnly = CardinalityStore.mergeSketches(
          spark.read.parquet(store)
            .filter(!$"batch_id".cast("long")
              .isin(dirty.map(_.toLong): _*)),
          Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      assert(est(store) === cleanOnly,
        "the gate must exclude exactly the dirty batches")
      assert(est(store) !== full,
        "gating dirty batches must change the answer on this fixture")
      // rebuild each dirty batch from retained raw minus the victim
      dirty.foreach { b =>
        CardinalityStore.rebuildBatch(
          slice(b).filter($"user_id" =!= victim), Seq("event_type"),
          "user_id", store, b.toLong)
      }
      assert(Tombstones.gatedBatches(spark, store).isEmpty,
        "every rebuilt batch must leave the gate")
      assert(est(store) === est(cleanStore),
        "rebuilt store must equal a store that never saw the victim " +
          "(registers are deterministic functions of the input set)")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("as-of read: snapshot at batch k equals a store that never saw " +
      "the later batches") {
    val dir = java.nio.file.Files.createTempDirectory("cardasof")
    try {
      val full = dir.resolve("full").toString
      val early = dir.resolve("early").toString
      (0 until 3).foreach { b =>
        val slice = ev.filter(pmod($"event_id", lit(3)) === b)
        CardinalityStore.applyBatch(slice, Seq("event_type"), "user_id",
          full, b.toLong)
        if (b <= 1) CardinalityStore.applyBatch(slice, Seq("event_type"),
          "user_id", early, b.toLong)
      }
      val asOf = CardinalityStore.estimateFromStore(spark, full,
          Seq("event_type"), asOfBatch = Some(1L))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      val truth = CardinalityStore.estimateFromStore(spark, early,
          Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      assert(asOf.nonEmpty && asOf === truth)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("ingest replay horizon (r18): at or below the watermark refuses " +
      "— a redelivery AT it would overwrite the fold — and the " +
      "gated-fold rebuild at == stays the one exception") {
    val dir = java.nio.file.Files.createTempDirectory("cardhorizon")
    try {
      val store = dir.resolve("store").toString
      def slice(b: Int) = ev.filter(pmod($"event_id", lit(5)) === b)
      (0 until 5).foreach(b => CardinalityStore.applyBatch(
        slice(b), Seq("event_type"), "user_id", store, b.toLong))
      def est() = CardinalityStore
        .estimateFromStore(spark, store, Seq("event_type"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      val before = est()
      CardinalityStore.compactThrough(spark, store, Seq("event_type"), 2L)
      // AT the watermark: before this guard the dynamic overwrite
      // replaced the fold partition with ONE batch's registers,
      // silently dropping batches 0-1 from every estimate
      val atFold = intercept[IllegalArgumentException](
        CardinalityStore.applyBatch(slice(2), Seq("event_type"),
          "user_id", store, 2L))
      assert(atFold.getMessage.contains("fold watermark 2"),
        atFold.getMessage)
      // strictly below: refused too (family pattern — idempotence
      // covers the answers, not the resurrected partition)
      intercept[IllegalArgumentException](
        CardinalityStore.applyBatch(slice(1), Seq("event_type"),
          "user_id", store, 1L))
      assert(est() === before, "refused ingests must not move answers")
      // the gated-fold whole-rebuild at == is the permitted overwrite:
      // gate the fold id, rebuild from the fold region's raw rows
      Tombstones.gateBatches(spark, store, Seq(2L), 0L)
      val foldRegion = ev.filter(pmod($"event_id", lit(5)) <= 2)
      CardinalityStore.rebuildBatch(foldRegion, Seq("event_type"),
        "user_id", store, 2L)
      assert(est() === before,
        "rebuild from the fold's own raw input must reproduce the store")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

}
