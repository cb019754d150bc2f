package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming Misra–Gries heavy hitters: the mergeable-summaries
  * guarantees must hold across per-trigger merges — store bounded by
  * k, no false negatives above N/(k+1), counts within [true − N/(k+1),
  * true] — and a replayed trigger must leave the store untouched.
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

  test("MG guarantees hold across triggers; store stays k-bounded") {
    val k = 8
    // 3 triggers; per trigger: 'hot' x20, 'warm' x8, 12 unique tail
    // terms. Totals: N = 3*(20+8+12) = 120; hot=60, warm=24, each
    // tail term=1. N/(k+1) = 13.3 → hot and warm MUST survive with
    // counts in [true − 13.3, true]; no tail term can exceed its true
    // count.
    val mkBatch = (t: Int) => Seq((t.toLong,
      (Seq.fill(20)("hot") ++ Seq.fill(8)("warm") ++
        (0 until 12).map(i => s"tail${t}_$i")).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-hh")
    val storePath = dir.resolve("hh").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = StreamingOps
        .heavyHittersStream(stream.toDF.toDF("doc_id", "text"),
          storePath, k = k)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      (0 until 3).foreach { t =>
        stream.addData(mkBatch(t))
        q.processAllAvailable()
      }
      q.stop()
      val store = spark.read.parquet(storePath)
        .select("term", "cnt").as[(String, Long)].collect().toMap
      assert(store.size <= k, s"store exceeded k=$k: ${store.size} rows")
      val n = 120.0
      val err = n / (k + 1)
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
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = StreamingOps
        .heavyHittersStream(stream.toDF.toDF("doc_id", "text"),
          storePath, k = 2)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      stream.addData(Seq((0L, text)))
      q.processAllAvailable()
      q.stop()
      val store = spark.read.parquet(storePath)
        .select("term", "cnt").as[(String, Long)].collect().toMap
      assert(store === Map("a" -> 3L, "b" -> 1L))
    } finally delete(dir)
  }

  test("replaying an applied batch id leaves the store byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hh2")
    val storePath = dir.resolve("hh").toString
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val writer = StreamingOps
        .heavyHittersStream(stream.toDF.toDF("doc_id", "text"),
          storePath, k = 4)
      val q = writer.trigger(Trigger.ProcessingTime(0)).start()
      stream.addData(Seq((0L, "x x x y z")))
      q.processAllAvailable()
      q.stop()
      val before = spark.read.parquet(storePath)
        .select("term", "cnt").as[(String, Long)].collect().toMap

      // a fresh query from a FRESH stream re-delivers batch 0 — the
      // store's batch_id high-water mark must make it a no-op instead
      // of double-counting x into 6
      val replay = MemoryStream[(Long, String)]
      val q2 = StreamingOps
        .heavyHittersStream(replay.toDF.toDF("doc_id", "text"),
          storePath, k = 4)
        .trigger(Trigger.ProcessingTime(0)).start()
      replay.addData(Seq((0L, "x x x y z")))
      q2.processAllAvailable()
      q2.stop()
      val after = spark.read.parquet(storePath)
        .select("term", "cnt").as[(String, Long)].collect().toMap
      assert(after === before, "replay must not double-count")
      assert(after("x") === 3L)
    } finally delete(dir)
  }
}
