package graft.streaming

import graft.SparkSpec
import graft.text.NearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.timestamp_seconds
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup candidate detection: documents fed in several
  * micro-batches must surface every pair the batch MinHash path verifies
  * — including pairs whose two members arrive in DIFFERENT batches
  * (that's what the keyed bucket state buys).
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming candidates cover all batch-verified pairs across micro-batches") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val truePairs = NearDup.minhashNeardupFast(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(truePairs.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingOps
      .neardupCandidatesStream(stream.toDF.toDF("doc_id", "text"))
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_cands")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // three micro-batches: planted dup pairs land on both sides of the
    // batch boundaries (ids are interleaved by modulus, so most pairs
    // straddle batches)
    docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val cands = spark.table("neardup_cands")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val missed = truePairs -- cands
    assert(missed.isEmpty, s"streaming candidates missed: $missed")
    // sub-quadratic sanity: nowhere near all-pairs
    val n = docs.length.toLong
    assert(cands.size < n * (n - 1) / 4,
      s"${cands.size} candidates for $n docs is not sub-quadratic-ish")
  }

  test("event-time TTL evicts idle buckets: an expired bucket stops matching") {
    implicit val sqlCtx = spark.sqlContext
    // identical texts share every band signature → guaranteed same buckets
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    val tickText = "completely different words with entirely unrelated content flowing"
    // event times in seconds — entirely simulated, no wall-clock sleeps
    // (away from epoch 0, the initial watermark value, where a row would
    // count as late): dupA at t=1000, a watermark-advancing tick at
    // t=1100, dupB at t=1101. After the tick's batch the watermark is
    // 1100 s; EventTimeTimeout then runs one extra batch that evicts
    // every bucket whose deadline < 1100 s.
    def run(ttlMs: Long, name: String): Set[(Long, Long)] = {
      val stream = MemoryStream[(Long, String, Long)]
      val docs = stream.toDF.toDF("doc_id", "text", "t_s")
        .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
      val q = StreamingOps
        .neardupCandidatesStreamTtl(docs, ttlMs = ttlMs)
        .toDF("d1", "d2")
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      stream.addData((1L, dupText, 1000L)); q.processAllAvailable()
      stream.addData((3L, tickText, 1100L)); q.processAllAvailable()
      stream.addData((2L, dupText, 1101L)); q.processAllAvailable()
      q.stop()
      spark.table(name).select("d1", "d2").as[(Long, Long)].collect().toSet
    }

    // control: 1000 s TTL — deadline 2000 s > watermark 1100 s, bucket
    // survives the gap and the pair is emitted
    assert(run(1000000L, "neardup_ttl_long").contains((1L, 2L)))
    // 10 s TTL — dupA's buckets' deadline (1010 s) expires when the
    // watermark reaches 1100 s, before dupB arrives: no pair
    assert(!run(10000L, "neardup_ttl_short").contains((1L, 2L)))
  }

  test("hot buckets age-prune members: docs farther apart than the TTL never pair") {
    implicit val sqlCtx = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    // doc 3 keeps the bucket hot (re-arming its eviction deadline), so
    // only the per-member age-prune can stop doc 1 from matching doc 2:
    //   1 @ 1000 s, 3 @ 1900 s (within ttl of 1 → pair), 2 @ 2800 s
    //   (1800 s after doc 1 > ttl 1000 s → (1,2) must NOT pair; 900 s
    //   after doc 3 → (2,3) must pair)
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF.toDF("doc_id", "text", "t_s")
      .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
    val q = StreamingOps
      .neardupCandidatesStreamTtl(docs, ttlMs = 1000000L)
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ttl_hot")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    stream.addData((1L, dupText, 1000L)); q.processAllAvailable()
    stream.addData((3L, dupText, 1900L)); q.processAllAvailable()
    stream.addData((2L, dupText, 2800L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_ttl_hot")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)), s"in-horizon pair (1,3) missing: $got")
    assert(got.contains((2L, 3L)), s"in-horizon pair (2,3) missing: $got")
    assert(!got.contains((1L, 2L)),
      s"docs 1800 s apart paired despite the 1000 s TTL: $got")
  }

  test("coalesced re-arrival pairs at its FIRST timestamp, refreshes to its last") {
    implicit val sqlCtx = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    // doc 2 arrives TWICE inside one micro-batch: at 1900 s (within the
    // 1000 s TTL of doc 1 @ 1000 s) and at 2200 s (beyond it). The
    // spaced run pairs (1,2) at the first arrival and treats the second
    // as a recency refresh — a coalesced replay must do the same, not
    // collapse doc 2 to its max time and miss the pair. The refresh must
    // still happen: doc 4 @ 3100 s is within ttl of 2200 s but not of
    // 1900 s, so (2,4) only pairs if doc 2's recency advanced.
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF.toDF("doc_id", "text", "t_s")
      .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
    val q = StreamingOps
      .neardupCandidatesStreamTtl(docs, ttlMs = 1000000L)
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_first_ts")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    stream.addData((1L, dupText, 1000L)); q.processAllAvailable()
    stream.addData(Seq((2L, dupText, 1900L), (2L, dupText, 2200L)))
    q.processAllAvailable()
    stream.addData((4L, dupText, 3100L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_first_ts")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)),
      s"pair at doc 2's first in-batch arrival missing: $got")
    assert(got.contains((2L, 4L)),
      s"re-arrival did not refresh doc 2's recency: $got")
    assert(!got.contains((1L, 4L)),
      s"docs 2100 s apart paired despite the 1000 s TTL: $got")
  }

  test("watermarkDelay > 0: a late-but-admitted arrival still pairs with an old member") {
    implicit val sqlCtx = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    // ttl 100 s, watermark delay 500 s:
    //   doc 1 @ 1000 s; doc 3 @ 1200 s (same text — keeps the bucket
    //   hot and advances the watermark to 700 s; 200 s gap > ttl, so
    //   (1,3) must NOT pair); doc 2 @ 1050 s — 150 s OLDER than the
    //   newest arrival but ≥ the 700 s watermark, so it is admitted,
    //   and |1050 − 1000| = 50 s ≤ ttl → (1,2) MUST pair.
    // A newest-arrival prune horizon (1200 − 100 = 1100 s) would have
    // dropped doc 1 during doc 3's batch and silently lost the pair;
    // the watermark horizon (500 − 100 = 400 s) carries it.
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF.toDF("doc_id", "text", "t_s")
      .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
    val q = StreamingOps
      .neardupCandidatesStreamTtl(docs, ttlMs = 100000L,
        watermarkDelay = "500 seconds")
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ttl_late")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    stream.addData((1L, dupText, 1000L)); q.processAllAvailable()
    stream.addData((3L, dupText, 1200L)); q.processAllAvailable()
    stream.addData((2L, dupText, 1050L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_ttl_late")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)),
      s"late-but-admitted arrival lost its in-ttl pair (1,2): $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      s"pairs farther apart than the 100 s TTL emitted: $got")
  }

  test("maxBucket saturation: stale members yield their slots so fresh arrivals pair") {
    implicit val sqlCtx = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    // ttl 500 s, maxBucket 2 — docs 1 @ 1000 s, 2 @ 1600 s, 3 @ 1900 s
    // share every bucket. Only (2,3) is within the TTL (300 s); (1,2)
    // 600 s and (1,3) 900 s are not. When doc 3 arrives the bucket is
    // AT the cap holding {1, 2}; doc 1 is stale relative to doc 3
    // (900 s > ttl) and must be pruned to free a slot, or doc 3 is
    // dropped and the legal pair (2,3) lost. Run the same history
    // spaced AND coalesced: the cap behavior must be layout-independent.
    def run(name: String, spaced: Boolean): Set[(Long, Long)] = {
      val stream = MemoryStream[(Long, String, Long)]
      val docs = stream.toDF.toDF("doc_id", "text", "t_s")
        .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
      val q = StreamingOps
        .neardupCandidatesStreamTtl(docs, ttlMs = 500000L, maxBucket = 2)
        .toDF("d1", "d2")
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val rows = Seq((1L, dupText, 1000L), (2L, dupText, 1600L),
        (3L, dupText, 1900L))
      if (spaced) rows.foreach { r =>
        stream.addData(r); q.processAllAvailable()
      }
      else { stream.addData(rows); q.processAllAvailable() }
      q.stop()
      spark.table(name).select("d1", "d2").as[(Long, Long)].collect().toSet
    }
    val spaced = run("neardup_cap_spaced", spaced = true)
    val coalesced = run("neardup_cap_coalesced", spaced = false)
    assert(spaced === Set((2L, 3L)),
      s"spaced batches at the cap: expected exactly (2,3), got $spaced")
    assert(coalesced === spaced,
      s"coalesced replay diverged from spaced batches at the cap: " +
        s"coalesced=$coalesced spaced=$spaced")
  }

  test("coalesced replay: one micro-batch emits the same pairs as spaced batches") {
    implicit val sqlCtx = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog once again today"
    // the hot-bucket scenario above, but all three docs land in a
    // SINGLE micro-batch — exactly what a replay that catches up on
    // history does. The TTL invariant must be batch-layout-independent:
    // (1,3) and (2,3) pair (≤ ttl apart), (1,2) never does (1800 s
    // apart > 1000 s ttl), even though doc 1 is older than the batch's
    // newest-arrival horizon while doc 3 arrives mid-batch.
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF.toDF("doc_id", "text", "t_s")
      .select($"doc_id", $"text", timestamp_seconds($"t_s").as("ts"))
    val q = StreamingOps
      .neardupCandidatesStreamTtl(docs, ttlMs = 1000000L)
      .toDF("d1", "d2")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_ttl_coalesced")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    stream.addData((1L, dupText, 1000L), (3L, dupText, 1900L),
      (2L, dupText, 2800L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_ttl_coalesced")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)), s"in-horizon pair (1,3) missing: $got")
    assert(got.contains((2L, 3L)), s"in-horizon pair (2,3) missing: $got")
    assert(!got.contains((1L, 2L)),
      s"same-batch docs 1800 s apart paired despite the 1000 s TTL: $got")
  }
}
