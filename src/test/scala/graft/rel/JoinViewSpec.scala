package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental join-view maintenance: batched facts equal the
  * from-scratch join-aggregate exactly, a dimension move re-keys the
  * moved customers' entire history without touching a fact, chained
  * moves compose, and redelivered batches no-op.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def ord = graft.Tables.orders(spark, sf0001)
  private def cust = graft.Tables.customer(spark, sf0001)

  private def fromScratch(dim: org.apache.spark.sql.DataFrame) = {
    val c = floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
    ord.join(dim.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count("o_totalprice").as("n_rows"),
        (sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(100.0)).as("sum_val"))
      .orderBy("c_nationkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getDouble(2)))
      .toSeq
  }

  private def viewRows(store: String) =
    JoinView.viewAtGrain(spark, store, "c_nationkey")
      .select("c_nationkey", "n_rows", "sum_val")
      .orderBy("c_nationkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getDouble(2)))
      .toSeq

  test("fact batches: view equals the from-scratch join-aggregate " +
      "bit-for-bit; dim move re-keys history without a fact rescan; " +
      "chained move composes; redelivery no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("joinviewspec")
    try {
      val store = dir.resolve("v").toString
      (0 until 3).foreach(b => JoinView.applyFactBatch(
        ord.filter(pmod($"o_orderkey", lit(3)) === b), cust,
        "o_custkey", "c_custkey", "c_nationkey", "o_totalprice",
        store, b.toLong))
      assert(viewRows(store) === fromScratch(cust),
        "batched view must equal from-scratch before any move")
      // move customers ≡ 1 (mod 20): nation += 1 (mod 25)
      val moved1 = cust.withColumn("c_nationkey",
        when(pmod($"c_custkey", lit(20)) === 1,
          ($"c_nationkey" + 1) % 25).otherwise($"c_nationkey"))
      val moves1 = cust.filter(pmod($"c_custkey", lit(20)) === 1)
        .select($"c_custkey", $"c_nationkey".as("old_c_nationkey"),
          (($"c_nationkey" + 1) % 25).as("new_c_nationkey"))
      JoinView.applyDimMove(spark, moves1, "c_custkey", "c_nationkey",
        store, 3L)
      assert(viewRows(store) === fromScratch(moved1),
        "post-move view must equal from-scratch over the modified dim")
      // chained move of the SAME customers: +1 again from their
      // CURRENT nation — the second move must find the rows where the
      // first move left them
      val moved2 = moved1.withColumn("c_nationkey",
        when(pmod($"c_custkey", lit(20)) === 1,
          ($"c_nationkey" + 1) % 25).otherwise($"c_nationkey"))
      val moves2 = moved1.filter(pmod($"c_custkey", lit(20)) === 1)
        .select($"c_custkey", $"c_nationkey".as("old_c_nationkey"),
          (($"c_nationkey" + 1) % 25).as("new_c_nationkey"))
      JoinView.applyDimMove(spark, moves2, "c_custkey", "c_nationkey",
        store, 4L)
      val afterChain = viewRows(store)
      assert(afterChain === fromScratch(moved2),
        "chained moves must compose exactly")
      // redelivery of the second move batch: partition overwrite fence
      JoinView.applyDimMove(spark, moves2, "c_custkey", "c_nationkey",
        store, 4L)
      assert(viewRows(store) === afterChain,
        "a replayed move batch must not change the view")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("compaction folds fact batches + the move into one partition; " +
      "view unchanged; a replayed folded move is an empty no-op") {
    val dir = java.nio.file.Files.createTempDirectory("joinviewcompact")
    try {
      val store = dir.resolve("v").toString
      (0 until 3).foreach(b => JoinView.applyFactBatch(
        ord.filter(pmod($"o_orderkey", lit(3)) === b), cust,
        "o_custkey", "c_custkey", "c_nationkey", "o_totalprice",
        store, b.toLong))
      val moves = cust.filter(pmod($"c_custkey", lit(20)) === 1)
        .select($"c_custkey", $"c_nationkey".as("old_c_nationkey"),
          (($"c_nationkey" + 1) % 25).as("new_c_nationkey"))
      JoinView.applyDimMove(spark, moves, "c_custkey", "c_nationkey",
        store, 3L)
      val before = viewRows(store)

      JoinView.compactThrough(spark, store, "c_custkey", "c_nationkey",
        through = 3L)
      assert(viewRows(store) === before, "compaction must not move answers")
      val parts = new java.io.File(store).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(parts === Seq("batch_id=3"), s"originals must prune: $parts")

      // the folded dim move replayed AFTER compaction: the recomputed
      // delta over the already-moved store is EMPTY — dynamic overwrite
      // writes nothing, answers and partitions stay put
      JoinView.applyDimMove(spark, moves, "c_custkey", "c_nationkey",
        store, 3L)
      assert(viewRows(store) === before,
        "a replayed folded move must be an empty no-op")
      val parts2 = new java.io.File(store).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(parts2 === Seq("batch_id=3"))
      // a replayed FACT batch at/below the watermark would re-add its
      // folded partials (or overwrite the fold at ==) — refused loudly
      // (the compactThrough scaladoc's rule, now enforced)
      val eF = intercept[IllegalArgumentException](JoinView.applyFactBatch(
        ord.filter(pmod($"o_orderkey", lit(3)) === 0), cust,
        "o_custkey", "c_custkey", "c_nationkey", "o_totalprice",
        store, 0L))
      assert(eF.getMessage.contains("replay horizon"), eF.getMessage)
      // a NEW (non-empty-delta) move re-using a folded id would
      // dynamic-overwrite the fold partition itself — refused. The
      // danger needs standing mass ABOVE the watermark (the move's
      // own-partition exclusion hides the fold from its delta read),
      // so land a legitimate fact batch 4 first.
      JoinView.applyFactBatch(
        ord.filter(pmod($"o_orderkey", lit(3)) === 0), cust,
        "o_custkey", "c_custkey", "c_nationkey", "o_totalprice",
        store, 4L)
      val afterFact = viewRows(store)
      val moves2 = cust.filter(pmod($"c_custkey", lit(20)) === 2)
        .select($"c_custkey", $"c_nationkey".as("old_c_nationkey"),
          (($"c_nationkey" + 2) % 25).as("new_c_nationkey"))
      val eM = intercept[IllegalArgumentException](JoinView.applyDimMove(
        spark, moves2, "c_custkey", "c_nationkey", store, 3L))
      assert(eM.getMessage.contains("replay horizon"), eM.getMessage)
      assert(viewRows(store) === afterFact,
        "the refused move must not land")
      JoinView.applyDimMove(spark, moves2, "c_custkey", "c_nationkey",
        store, 5L)
      assert(viewRows(store) !== afterFact, "the fresh-id move must land")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
