package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Streaming Misra–Gries heavy hitters: the mergeable-summaries
  * guarantees must hold across per-trigger merges — counters bounded
  * by k, no false negatives above N/(k+1), counts within
  * [true − N/(k+1), true] — and a redelivered batch id must leave the
  * store untouched, including after a rewrite the truncation emptied.
  */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def delete(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    val paths = try walk.iterator().asScala.toSeq finally walk.close()
    paths.sortBy(-_.getNameCount)
      .foreach(x => java.nio.file.Files.deleteIfExists(x))
  }

  /** Non-sentinel counters. */
  private def counters(storePath: String): Map[String, Long] =
    spark.read.parquet(storePath).filter(col("term").isNotNull)
      .select("term", "cnt").as[(String, Long)].collect().toMap

  private def runBatches(storePath: String, k: Int,
      batches: Seq[Seq[(Long, String)]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps
      .heavyHittersStream(stream.toDF.toDF("doc_id", "text"), storePath, k)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
  }

  test("MG guarantees hold across triggers; counters stay k-bounded") {
    val k = 8
    // 3 triggers; per trigger: 'hot' x20, 'warm' x8, 12 unique tail
    // terms. Totals: N = 3*(20+8+12) = 120; hot=60, warm=24, each tail
    // term=1. N/(k+1) = 13.3 → hot and warm MUST survive with counts
    // in [true − 13.3, true]; no term may exceed its true count.
    val dir = java.nio.file.Files.createTempDirectory("graft-hh")
    val storePath = dir.resolve("hh").toString
    try {
      runBatches(storePath, k, (0 until 3).map(t => Seq((t.toLong,
        (Seq.fill(20)("hot") ++ Seq.fill(8)("warm") ++
          (0 until 12).map(i => s"tail${t}_$i")).mkString(" ")))))
      val store = counters(storePath)
      assert(store.size <= k, s"counters exceeded k=$k: ${store.size}")
      val err = 120.0 / (k + 1)
      val truth = Map("hot" -> 60L, "warm" -> 24L).withDefaultValue(1L)
      assert(store.contains("hot") && store.contains("warm"),
        s"terms above N/(k+1) must never be dropped; store=$store")
      store.foreach { case (term, cnt) =>
        assert(cnt <= truth(term), s"$term overcounted: $cnt")
        assert(cnt >= truth(term) - err,
          s"$term undercounted past the MG bound: $cnt vs ${truth(term)}")
      }
    } finally delete(dir)
  }

  test("summary matches one-shot Misra-Gries semantics on a single batch") {
    // one trigger = exact counts then ONE truncation: with k=2 and
    // counts a=5, b=3, c=2, d=1 the (k+1)-th largest is 2 → store
    // holds a=3, b=1 (c,d dropped)
    val text = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-hh1")
    val storePath = dir.resolve("hh").toString
    try {
      runBatches(storePath, 2, Seq(Seq((0L, text))))
      assert(counters(storePath) === Map("a" -> 3L, "b" -> 1L))
    } finally delete(dir)
  }

  test("redelivered batch ids are skipped — the store never double-counts") {
    // batch ids restart at 0 for each new query, which is exactly what
    // a foreachBatch redelivery after an uncommitted trigger looks
    // like; the documented contract is one store per checkpoint
    // lineage, so the second query BELOW plays the redelivery
    val dir = java.nio.file.Files.createTempDirectory("graft-hh2")
    val storePath = dir.resolve("hh").toString
    try {
      runBatches(storePath, 4, Seq(Seq((0L, "x x x y z"))))
      val before = counters(storePath)
      runBatches(storePath, 4, Seq(Seq((0L, "x x x y z"))))
      assert(counters(storePath) === before, "replay must not double-count")
      assert(before("x") === 3L)
    } finally delete(dir)
  }

  test("high-water mark survives a rewrite the truncation left empty") {
    // k=1: batch 0 'h h h t' stores {h:2}; batch 1 'x x' merges to
    // {h:2, x:2}, d=2 → ZERO surviving counters. The sentinel row must
    // still carry batch_id=1, so a redelivered batch 1 (and 0) is
    // skipped instead of re-applied against the emptied store.
    val dir = java.nio.file.Files.createTempDirectory("graft-hh3")
    val storePath = dir.resolve("hh").toString
    try {
      runBatches(storePath, 1,
        Seq(Seq((0L, "h h h t")), Seq((1L, "x x"))))
      assert(counters(storePath) === Map.empty[String, Long])
      val applied = spark.read.parquet(storePath)
        .agg(org.apache.spark.sql.functions.max("batch_id"))
        .head.getLong(0)
      assert(applied === 1L, "sentinel must carry the high-water mark")
      // redelivery of both already-applied batch ids: no-ops
      runBatches(storePath, 1,
        Seq(Seq((10L, "h h h t")), Seq((11L, "x x"))))
      assert(counters(storePath) === Map.empty[String, Long])
      assert(spark.read.parquet(storePath)
        .agg(org.apache.spark.sql.functions.max("batch_id"))
        .head.getLong(0) === 1L)
    } finally delete(dir)
  }
}
