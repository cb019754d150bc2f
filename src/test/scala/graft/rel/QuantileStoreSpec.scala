package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The quantile store's contract: merged per-batch sketches answer
  * within the sketch's rank-error band of the EXACT percentiles,
  * n_rows stays exactly the raw row count through sketch + merge,
  * redelivery cannot change n_rows or grow the store, and streaming
  * ingest lands a store answering like the batch loop's.
  */
class QuantileStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ord = graft.Tables.orders(spark, sf0001)
  private val gc = Seq("o_orderstatus")

  private def exactPct = ord.groupBy("o_orderstatus")
    .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.9)").as("p90"),
      count(lit(1)).as("n"))
    .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
      r.getLong(3))).toMap

  test("store answers: n exact, quantiles within the rank-error band") {
    val got = QuantileStore.nqKllStore(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(4))).toMap
    val exact = exactPct
    assert(got.keySet === exact.keySet)
    exact.foreach { case (g, (p50, p90, n)) =>
      val (e50, e90, en) = got(g)
      assert(en === n, s"$g: n_rows $en != exact $n")
      // rank-error ~1/k (k=256) plus discreteness; compare by the
      // VALUE band of ±4% of the group's rank mass translated through
      // the empirical distribution: re-rank the estimate and demand
      // its true rank is within 4% of target
      def rankOf(v: Double): Double =
        ord.filter($"o_orderstatus" === g && $"o_totalprice" <= v).count()
          .toDouble / n
      assert(math.abs(rankOf(e50) - 0.5) <= 0.04,
        s"$g: p50 est $e50 (exact $p50) off by rank > 4%")
      assert(math.abs(rankOf(e90) - 0.9) <= 0.04,
        s"$g: p90 est $e90 (exact $p90) off by rank > 4%")
    }
  }

  test("redelivery: n_rows unchanged, store size unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("kllstore_spec")
    try {
      val store = dir.resolve("s.parquet").toString
      val b0 = ord.filter(pmod($"o_orderkey", lit(2)) === 0)
      val b1 = ord.filter(pmod($"o_orderkey", lit(2)) === 1)
      QuantileStore.applyBatch(b0, gc, "o_totalprice", store, 0L, 256)
      QuantileStore.applyBatch(b1, gc, "o_totalprice", store, 1L, 256)
      def answers = QuantileStore.quantilesOf(
          QuantileStore.sketchesFromStore(spark, store, gc, 256),
          gc, Seq(("p50", 1, 2)))
        .orderBy("o_orderstatus")
        .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      def nFiles = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .count(p => p.toString.endsWith(".parquet") &&
            java.nio.file.Files.isRegularFile(p))
      }
      val before = answers
      val filesBefore = nFiles
      assert(before.map(_._2).sum === ord.count(),
        "weight conservation through the store must be exact")
      // a replayed batch must overwrite its own partition, not append
      QuantileStore.applyBatch(b1, gc, "o_totalprice", store, 1L, 256)
      assert(answers.map(_._2) === before.map(_._2),
        "redelivery must not change any group's n")
      assert(nFiles === filesBefore, "redelivery must not grow the store")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("streaming ingest answers like the batch loop") {
    val dir = java.nio.file.Files.createTempDirectory("kllstream_spec")
    try {
      val store = dir.resolve("s.parquet").toString
      val rows = ord.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .as[(Long, String, Double)].collect()
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Double)]
      val q = QuantileStore.kllIngestStream(
          stream.toDF.toDF("o_orderkey", "o_orderstatus", "o_totalprice"),
          gc, "o_totalprice", store, 256)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
        stream.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      q.stop()
      val ns = QuantileStore.quantilesOf(
          QuantileStore.sketchesFromStore(spark, store, gc, 256),
          gc, Seq(("p50", 1, 2)))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val exact = ord.groupBy("o_orderstatus").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ns === exact,
        "streamed store must conserve every group's weight exactly")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("horizontal compaction: total weight exactly preserved, " +
      "quantiles stay in band, as-of guarded, ingest below the " +
      "watermark refused — EXCEPT the gated-fold rebuild in place") {
    val dir = java.nio.file.Files.createTempDirectory("kllcompact")
    try {
      val store = dir.resolve("s").toString
      def slice(b: Int) = ord.filter(pmod($"o_orderkey", lit(4)) === b)
      (0 until 4).foreach(b => QuantileStore.applyBatch(
        slice(b), gc, "o_totalprice", store, b.toLong, 256))
      def totalWeight = QuantileStore
        .sketchesFromStore(spark, store, gc, 256)
        .select(col("o_orderstatus"), explode(col("sk")).as("it"))
        .groupBy("o_orderstatus").agg(sum("it.w").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def p50 = QuantileStore.quantilesOf(
          QuantileStore.sketchesFromStore(spark, store, gc, 256),
          gc, Seq(("p50", 1, 2)))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val wBefore = totalWeight
      QuantileStore.compactThrough(spark, store, gc, 256, 2L)
      val parts = spark.read.parquet(store)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(parts === Set(2L, 3L), s"got $parts")
      // the re-feed merge inserts weight 2^l at level l — total weight
      // (= the row count) survives the fold EXACTLY
      assert(totalWeight === wBefore)
      // and the estimates stay in the rank-error band of the raw data
      val exact = exactPct
      p50.foreach { case (g, v) =>
        val n = exact(g)._3
        val rank = ord.filter($"o_orderstatus" === g &&
          $"o_totalprice" <= v).count().toDouble / n
        assert(math.abs(rank - 0.5) <= 0.04, s"$g: post-fold p50 $v")
      }
      val e = intercept[IllegalArgumentException](
        QuantileStore.sketchesFromStore(spark, store, gc, 256, Some(1L)))
      assert(e.getMessage.contains("fold watermark 2"), e.getMessage)
      // INGEST guard: KLL weights are additive, so a below-watermark
      // replay would double-count — refused at and below the fold
      val e2 = intercept[IllegalArgumentException](QuantileStore
        .applyBatch(slice(0), gc, "o_totalprice", store, 1L, 256))
      assert(e2.getMessage.contains("replay horizon"), e2.getMessage)
      intercept[IllegalArgumentException](QuantileStore
        .applyBatch(slice(0), gc, "o_totalprice", store, 2L, 256))
      // …except the GATED-fold rebuild: gate the fold id (its folded
      // history contains deleted keys), re-sketch its retained raw
      // input in place at the SAME id, ungate — the rebuild-or-gate
      // contract's whole-fold form
      Tombstones.gateBatches(spark, store, Seq(2L), 0L)
      QuantileStore.applyBatch(
        slice(0).unionAll(slice(1)).unionAll(slice(2)), gc,
        "o_totalprice", store, 2L, 256)
      Tombstones.ungateBatch(spark, store, 2L)
      assert(totalWeight === wBefore,
        "the in-place whole-fold rebuild must restore the full weight")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("as-of read: the snapshot sketch set equals a batches-0..k merge") {
    val dir = java.nio.file.Files.createTempDirectory("kllasof")
    try {
      val store = dir.resolve("s.parquet").toString
      (0 until 3).foreach(b => QuantileStore.applyBatch(
        ord.filter(pmod($"o_orderkey", lit(3)) === b),
        gc, "o_totalprice", store, b.toLong, 256))
      val asOf = QuantileStore.quantilesOf(
          QuantileStore.sketchesFromStore(spark, store, gc, 256,
            asOfBatch = Some(1L)),
          gc, Seq(("p50", 1, 2)))
        .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
      val truth = QuantileStore.quantilesOf(
          QuantileStore.mergeSketches(
            (0 to 1).map(b => QuantileStore.sketchBatch(
              ord.filter(pmod($"o_orderkey", lit(3)) === b),
              gc, "o_totalprice", 256)).reduce(_ unionAll _), gc, 256),
          gc, Seq(("p50", 1, 2)))
        .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
      assert(asOf.nonEmpty && asOf === truth)
      // weight conservation: the snapshot's n is EXACTLY the 0..1 rows
      assert(asOf.map(_.apply(2).asInstanceOf[Long]).sum ===
        ord.filter(pmod($"o_orderkey", lit(3)) <= 1).count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

}
