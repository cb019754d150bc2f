package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The standing-cluster store's contract: per-batch pair merges equal
  * the one-shot min-label connected components, remap chains resolve
  * transitively, replay is idempotent (fenced reads), and singleton
  * members assign themselves. */
class MediaClusterStoreSpec extends SparkSpec {
  import spark.implicits._

  private def members(rows: Long*) =
    rows.toSeq.map((_, "image")).toDF("media_id", "modality")

  private def prs(rows: (Long, Long)*) =
    rows.toSeq.map { case (a, b) => ("image", a, b) }
      .toDF("modality", "id_a", "id_b")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix)

  private def rmrf(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private def clusters(store: String) =
    MediaClusterStore.assignmentsFromStore(spark, store)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap

  test("cross-batch merges remap standing clusters to the component " +
      "min, through remap CHAINS") {
    val dir = tmp("mcluster")
    try {
      val store = dir.resolve("c").toString
      // batch 0: {10, 11} -> label 10; 12 is a singleton
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L, 12L), prs((10L, 11L)), store, 0L)
      assert(clusters(store) === Map(10L -> 10L, 11L -> 10L, 12L -> 12L))
      // batch 1: {20, 21} -> label 20
      MediaClusterStore.applyClusterBatch(spark,
        members(20L, 21L), prs((20L, 21L)), store, 1L)
      assert(clusters(store)(21L) === 20L)
      // batch 2: member 5 bridges BOTH standing clusters -> root 5
      MediaClusterStore.applyClusterBatch(spark,
        members(5L), prs((5L, 11L), (5L, 21L)), store, 2L)
      assert(clusters(store) === Map(5L -> 5L, 10L -> 5L, 11L -> 5L,
        20L -> 5L, 21L -> 5L, 12L -> 12L))
      // batch 3: member 1 pairs with 10 — 10's RAW label is 10, whose
      // remap chain is 10 -> 5; the new root 1 must reach EVERYONE
      // (a chain break would leave 20/21 stranded at 5)
      MediaClusterStore.applyClusterBatch(spark,
        members(1L), prs((1L, 10L)), store, 3L)
      assert(clusters(store) === Map(1L -> 1L, 5L -> 1L, 10L -> 1L,
        11L -> 1L, 20L -> 1L, 21L -> 1L, 12L -> 12L))
    } finally rmrf(dir)
  }

  test("as-of reads fence assignments AND remaps; erasure applies at " +
      "every as-of") {
    val dir = tmp("mclusterasof")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(5L), prs((5L, 11L)), store, 1L)
      def at(b: Option[Long]) = MediaClusterStore
        .assignmentsFromStore(spark, store, b)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // the batch-1 bridge must NOT retro-merge the as-of-0 view
      assert(at(Some(0L)) === Map(10L -> 10L, 11L -> 10L))
      assert(at(Some(1L)) === Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
      assert(at(None) === at(Some(1L)))
      // erasure is not rewindable: it suppresses at every as-of
      MediaClusterStore.deleteMembers(members(10L), store, 0L)
      val surv0 = MediaClusterStore
        .survivingAssignments(spark, store, Some(0L))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(surv0 === Map(11L -> 11L))
    } finally rmrf(dir)
  }

  test("as-of below the compaction fold watermark fails LOUDLY instead " +
      "of serving an empty history (the one silent-wrong-answer class " +
      "the store family had left)") {
    val dir = tmp("mclusterwmark")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(20L), prs((20L, 11L)), store, 1L)
      MediaClusterStore.applyClusterBatch(spark,
        members(30L), prs(), store, 2L)
      // never compacted: pre-history as-of reads empty, no guard
      assert(MediaClusterStore.assignmentsFromStore(spark, store, Some(-1L))
        .collect().isEmpty)
      def at(b: Long) = MediaClusterStore
        .assignmentsFromStore(spark, store, Some(b))
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val at1 = at(1L)
      MediaClusterStore.compactThrough(spark, store, through = 1L)
      val e = intercept[IllegalArgumentException](at(0L))
      assert(e.getMessage.contains("fold watermark 1") &&
        e.getMessage.contains("no longer derivable"), e.getMessage)
      assert(at(1L) === at1, "as-of AT the watermark must survive")
      assert(at(2L)(30L) === 30L)
      // the surviving view inherits the guard (it reads through the
      // same as-of path)
      intercept[IllegalArgumentException](
        MediaClusterStore.survivingAssignments(spark, store, Some(0L))
          .collect())
      // the MERGE side of the same horizon: a replayed batch at or
      // below the watermark would read an empty prior view, treat
      // standing members as fresh, and resurrect a pruned partition —
      // refused loudly; a fresh id above it merges fine
      val e2 = intercept[IllegalArgumentException](
        MediaClusterStore.applyClusterBatch(spark,
          members(20L), prs((20L, 11L)), store, 1L))
      assert(e2.getMessage.contains("replay horizon"), e2.getMessage)
      MediaClusterStore.applyClusterBatch(spark,
        members(40L), prs((40L, 30L)), store, 3L)
      assert(at(3L)(40L) === 30L)
    } finally rmrf(dir)
  }

  test("reclusterAffected on a store with NO tombstone log reports " +
      "divergenceChecked=false — a skipped detection is never a " +
      "'checked and clean' zero") {
    val dir = tmp("mclusternotomb")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      val stats = MediaClusterStore.reclusterAffected(spark, store,
        prs((10L, 11L)))
      assert(!stats.staged && !stats.divergenceChecked)
    } finally rmrf(dir)
  }

  test("replay of a batch re-derives byte-identical partitions " +
      "(fenced reads make at-least-once delivery safe)") {
    val dir = tmp("mclusterreplay")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(20L), prs((20L, 11L)), store, 1L)
      val before = clusters(store)
      assert(before === Map(10L -> 10L, 11L -> 10L, 20L -> 10L))
      // redeliver batch 1 AFTER it already applied: reads are fenced
      // to batches < 1, so the recomputed partition is byte-identical
      MediaClusterStore.applyClusterBatch(spark,
        members(20L), prs((20L, 11L)), store, 1L)
      assert(clusters(store) === before)
    } finally rmrf(dir)
  }

  test("erasure suppresses membership, re-elects the keeper to the " +
      "min survivor, and filters re-arrivals") {
    val dir = tmp("mclusterdel")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L, 12L), prs((10L, 11L)), store, 0L)
      // erase the cluster's MIN (10) and the singleton 12
      MediaClusterStore.deleteMembers(
        members(10L, 12L), store, 0L)
      def surviving = MediaClusterStore
        .survivingAssignments(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // 11 survives alone; the served cluster id RE-ELECTS to 11 (the
      // raw label 10 names erased media and must not be served)
      assert(surviving === Map(11L -> 11L))
      // a batch re-delivering the erased member writes no assignment
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 20L), prs(), store, 1L)
      assert(surviving === Map(11L -> 11L, 20L -> 20L))
      // the un-erased view still resolves raw labels (labels are
      // opaque lineage ids; erased membership only hides ROWS)
      val raw = MediaClusterStore.assignmentsFromStore(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(raw(11L) === 10L)
    } finally rmrf(dir)
  }

  test("delete entry: erased bases vanish, their brightness copies " +
      "become their own keepers, nothing else moves") {
    val out = MediaClusterStore.nqMediaClustersDelete(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = out.map(t => t._1 -> t).toMap
    val erased = graft.Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect().filter(_ % 10 == 0)
    assert(erased.nonEmpty)
    erased.foreach { base =>
      assert(!byId.contains(base), s"erased base $base still served")
      // its brightness copy survives and re-elects itself as keeper
      // (unless a wider collision cluster holds a smaller survivor)
      val copy = base + 1000000L
      assert(byId.contains(copy), s"copy $copy lost with its base")
      val (_, cl, k) = byId(copy)
      assert(cl >= 0 && (k == (copy == cl)))
    }
  }

  test("streaming crawl loop: judge -> cluster-merge -> ingest per " +
      "micro-batch equals the batch path; replay is idempotent") {
    val dir = tmp("mclusterstream")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Long)]
      val q = MediaClusterStore.clusterIngestStream(
          stream.toDF.toDF("media_id", "modality", "h"), fp, cl)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .start()
      stream.addData((10L, "image", 0L), (11L, "image", 3L))
      q.processAllAvailable()
      stream.addData((5L, "image", 1L)) // bridges nothing new... pairs with both
      q.processAllAvailable()
      q.stop()
      assert(clusters(cl) === Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
      // replay batch 1 after it fully applied (at-least-once): every
      // stage reads batches < 1, so partitions re-derive byte-identical
      val lineage = {
        val src = scala.io.Source.fromFile(s"$fp/_lineage")
        try src.mkString.trim finally src.close()
      }
      MediaClusterStore.applyClusterIngestBatch(
        Seq((5L, "image", 1L)).toDF("media_id", "modality", "h"),
        fp, cl, 1L, lineage)
      assert(clusters(cl) === Map(5L -> 5L, 10L -> 5L, 11L -> 5L))
      assert(MediaDedupStore.fingerprintsFromStore(spark, fp)
        .count() === 3L)
    } finally rmrf(dir)
  }

  test("compaction folds with remaps baked in and tombstones aged; " +
      "reads identical; re-run no-op") {
    val dir = tmp("mclustercompact")
    try {
      val store = dir.resolve("c").toString
      // batch 0: {10,11} -> 10; batch 1: 5 bridges -> remap 10 -> 5;
      // batch 2: 20 (own cluster)
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(5L), prs((5L, 10L)), store, 1L)
      MediaClusterStore.applyClusterBatch(spark,
        members(20L), prs(), store, 2L)
      // erase 11 (only copy inside the fold: tombstone ages out) and
      // 20 (copy beyond the watermark: tombstone must survive)
      MediaClusterStore.deleteMembers(members(11L, 20L), store, 0L)
      def surviving = MediaClusterStore
        .survivingAssignments(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val before = surviving
      assert(before === Map(5L -> 5L, 10L -> 5L))

      MediaClusterStore.compactThrough(spark, store, through = 1L)
      assert(surviving === before, "compaction must be read-invisible")
      // the folded region's remap (10 -> 5) is BAKED IN: raw labels in
      // the fold already read 5, and the remap log is pruned away
      assert(!new java.io.File(s"$store/_remaps").exists(),
        "folded remap partitions must prune (and an empty log its root)")
      val tombs = spark.read.parquet(s"$store/_cluster_tombstones")
        .select("media_id").collect().map(_.getLong(0)).toSeq
      assert(tombs === Seq(20L),
        "only the beyond-watermark tombstone survives the fold")
      val parts = new java.io.File(s"$store/assignments").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(parts === Seq("batch_id=1", "batch_id=2"))
      // re-run: full no-op
      MediaClusterStore.compactThrough(spark, store, through = 1L)
      assert(surviving === before)
    } finally rmrf(dir)
  }

  test("compact entry equals the delete entry (read-invisibility " +
      "through the full relabeled assignment)") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val del = asSet(MediaClusterStore.nqMediaClustersDelete(spark, sf0001))
    val cmp = asSet(MediaClusterStore.nqMediaClustersCompact(spark, sf0001))
    assert(cmp === del, s"diff = ${cmp.diff(del) ++ del.diff(cmp)}")
  }

  test("mirrored re-posts join their originals' standing clusters " +
      "(flip multi-probe fingerprints through judge + merge)") {
    val dir = tmp("mclusterflip")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      val fps = MediaDedupStore.flipFingerprints(spark, sf0001)
      val isCopy = col("media_id") >= 1000000L
      Seq((0L, fps.filter(!isCopy)), (1L, fps.filter(isCopy)))
        .foreach { case (b, batch) =>
          val pairs = MediaDedupStore.judgeBatch(spark, batch, fp, b)
          MediaClusterStore.applyClusterBatch(spark,
            // multi-probe relations carry 8 rows per media: members
            // dedupe to (media_id, modality) — the documented contract
            batch.select("media_id", "modality").distinct(),
            pairs.select("modality", "id_a", "id_b"), cl, b)
          MediaDedupStore.applyFingerprintBatch(batch, fp, b)
        }
      val assigned = clusters(cl)
      val planted = graft.Tables.documents(spark, sf0001)
        .select("doc_id").as[Long].collect()
        .collect {
          case id if id % 10 == 0 => (id, id + 1000000L)
          case id if id % 10 == 5 => (id, id + 2000000L)
        }
      assert(planted.nonEmpty)
      planted.foreach { case (base, copy) =>
        assert(assigned(copy) === assigned(base),
          s"re-post $copy not clustered with its original $base")
      }
    } finally rmrf(dir)
  }

  test("the store is modality-generic: the text MinHash incremental " +
      "path through it equals the one-shot banded clustering") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val inc = asSet(MediaClusterStore.nqTextClustersInc(spark, sf0001))
    val oneShot = asSet(
      graft.text.DedupClusters.dedupClusters(spark, sf0001))
    assert(inc.nonEmpty)
    assert(inc === oneShot,
      s"diff = ${inc.diff(oneShot) ++ oneShot.diff(inc)}")
  }

  test("an id re-arriving under a NEW batch id fails loudly at merge " +
      "time (the judge's equal-id diagnostic), while a same-id replay " +
      "stays silent") {
    val dir = tmp("mclusterrearrive")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      def batch(rows: (Long, String, Long)*) =
        rows.toSeq.toDF("media_id", "modality", "h")
      MediaClusterStore.applyClusterIngestBatch(
        batch((10L, "image", 7L)), fp, cl, 0L, "spec-lineage")
      // replaying the SAME id is the at-least-once contract: the fence
      // excludes the batch's own stored copy, so no diagnostic fires
      MediaClusterStore.applyClusterIngestBatch(
        batch((10L, "image", 7L)), fp, cl, 0L, "spec-lineage")
      assert(clusters(cl) === Map(10L -> 10L))
      // the same id under a NEW batch id collides with its standing
      // copy in the banded join — detected, not merely documented
      val e = intercept[IllegalArgumentException] {
        MediaClusterStore.applyClusterIngestBatch(
          batch((10L, "image", 7L)), fp, cl, 1L, "spec-lineage")
      }
      assert(e.getMessage.contains("re-delivers"))
      assert(e.getMessage.contains("(image, 10)"))
    } finally rmrf(dir)
  }

  test("above the remap bound, merges and reads fall back to the " +
      "distributed pointer-doubled closure (chains included) and " +
      "still serve correctly; compaction restores the fast path") {
    val dir = tmp("mclusterbound")
    try {
      val store = dir.resolve("c").toString
      // two chained merges -> 2 merge events in the log (10 -> 5 -> 3)
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(5L), prs((5L, 10L)), store, 1L)
      MediaClusterStore.applyClusterBatch(spark,
        members(3L), prs((3L, 5L)), store, 2L)
      val expect = Map(3L -> 3L, 5L -> 3L, 10L -> 3L, 11L -> 3L)
      assert(clusters(store) === expect) // broadcast fast path
      spark.conf.set(MediaClusterStore.MaxRemapRowsConf, "1")
      try {
        // READ fallback: the 2-event log exceeds the bound, so the
        // closure joins as a relation — same answer, chain resolved
        assert(clusters(store) === expect)
        // MERGE fallback: the standing endpoint's label resolves
        // through the relation (11's raw label 10 must reach 3, then
        // the new member 1 re-roots everyone)
        MediaClusterStore.applyClusterBatch(spark,
          members(1L), prs((1L, 11L)), store, 3L)
        assert(clusters(store) === Map(1L -> 1L, 3L -> 1L, 5L -> 1L,
          10L -> 1L, 11L -> 1L))
        // compaction bakes the (relation-joined) closure and prunes —
        // the broadcast fast path is back and answers identically
        MediaClusterStore.compactThrough(spark, store, through = 3L)
        assert(!new java.io.File(s"$store/_remaps").exists())
      } finally spark.conf.unset(MediaClusterStore.MaxRemapRowsConf)
      assert(clusters(store) === Map(1L -> 1L, 3L -> 1L, 5L -> 1L,
        10L -> 1L, 11L -> 1L))
    } finally rmrf(dir)
  }

  test("over-bound resolution memoizes per log state: repeat reads " +
      "reuse ONE pointer-doubling run, a log mutation recomputes, and " +
      "the memoized path equals the recomputed one exactly") {
    val dir = tmp("mclustermemo")
    try {
      val store = dir.resolve("c").toString
      // a 4-deep remap chain (20 -> 15 -> 10 -> 5 -> 3)
      MediaClusterStore.applyClusterBatch(spark,
        members(20L, 21L), prs((20L, 21L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(15L), prs((15L, 20L)), store, 1L)
      MediaClusterStore.applyClusterBatch(spark,
        members(10L), prs((10L, 21L)), store, 2L)
      MediaClusterStore.applyClusterBatch(spark,
        members(5L), prs((5L, 20L)), store, 3L)
      MediaClusterStore.applyClusterBatch(spark,
        members(3L), prs((3L, 21L)), store, 4L)
      val expect = Map(3L -> 3L, 5L -> 3L, 10L -> 3L, 15L -> 3L,
        20L -> 3L, 21L -> 3L)
      spark.conf.set(MediaClusterStore.MaxRemapRowsConf, "1")
      try {
        MediaClusterStore.clearRemapMemo()
        val runs0 = MediaClusterStore.remapResolveRuns.get()
        val cold = clusters(store)
        assert(cold === expect)
        val runsAfterCold = MediaClusterStore.remapResolveRuns.get()
        assert(runsAfterCold > runs0,
          "the cold over-bound read must run the pointer doubling")
        // warm reads: answers identical, ZERO additional doubling runs
        assert(clusters(store) === expect)
        assert(clusters(store) === expect)
        assert(MediaClusterStore.remapResolveRuns.get() === runsAfterCold,
          "warm over-bound reads must reuse the memoized relation")
        // memoized ≡ recomputed: drop the memo and compare verbatim
        MediaClusterStore.clearRemapMemo()
        assert(clusters(store) === cold)
        assert(MediaClusterStore.remapResolveRuns.get() > runsAfterCold,
          "after clearRemapMemo the read must recompute")
        // a log MUTATION (new merge event) invalidates the memo: the
        // bridge below must surface through a FRESH resolution
        val runsPreMerge = MediaClusterStore.remapResolveRuns.get()
        MediaClusterStore.applyClusterBatch(spark,
          members(1L), prs((1L, 21L)), store, 5L)
        val after = clusters(store)
        assert(after === expect.keySet.map(_ -> 1L).toMap + (1L -> 1L))
        assert(MediaClusterStore.remapResolveRuns.get() > runsPreMerge,
          "a grown log must recompute, not serve the stale closure")
      } finally spark.conf.unset(MediaClusterStore.MaxRemapRowsConf)
      // back under the bound: the broadcast fast path serves the same
      assert(clusters(store) ===
        expect.keySet.map(_ -> 1L).toMap + (1L -> 1L))
    } finally rmrf(dir)
  }

  test("an all-tombstoned first batch leaves a readable (empty) " +
      "store: partition-less dirs read as empty, later batches land") {
    val dir = tmp("mclusterempty")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.deleteMembers(members(10L), store, 0L)
      // every member tombstoned -> the dynamic overwrite writes NO
      // partition; the dir (if created) is file-less
      MediaClusterStore.applyClusterBatch(spark,
        members(10L), prs(), store, 0L)
      assert(MediaClusterStore.assignmentsFromStore(spark, store)
        .count() === 0L)
      assert(MediaClusterStore.survivingAssignments(spark, store)
        .count() === 0L)
      // the store is not bricked: a later batch lands and serves
      MediaClusterStore.applyClusterBatch(spark,
        members(20L), prs(), store, 1L)
      assert(clusters(store) === Map(20L -> 20L))
    } finally rmrf(dir)
  }

  test("erase-while-streaming caveat (spec-pinned): a replay AFTER an " +
      "erasure can diverge — a remap computed from since-erased pairs " +
      "is cross-batch state later batches built on") {
    val dir = tmp("mclustermidstream")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      def batch(rows: (Long, Long)*) = rows.toSeq
        .map { case (id, h) => (id, "image", h) }
        .toDF("media_id", "modality", "h")
      def ingest(id: Long, rows: (Long, Long)*) =
        MediaClusterStore.applyClusterIngestBatch(batch(rows: _*), fp,
          cl, id, "spec-lineage")
      def surviving = MediaClusterStore
        .survivingAssignments(spark, cl)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // batch 0: clique {20, 21, 22} -> cluster 20
      ingest(0L, (20L, 0xFFFL), (21L, 0xFFFL), (22L, 0xFFFL))
      // batch 1: {3, 5} bridge it (hamming(0xFFF, 0xFC0) = 6) -> the
      // merge event 20 -> 3 is computed FROM pairs naming member 3
      ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L))
      // mid-stream erasure of 3 (both stores, the maintenance pairing)
      MediaClusterStore.deleteMembers(members(3L), cl, 0L)
      MediaDedupStore.deleteMedia(members(3L), fp, 0L)
      // batch 2: member 7 joins the standing cluster through 5
      ingest(2L, (7L, 0xFC0L))
      // so far: suppression + historical topology hold — everyone
      // (incl. 7, assigned via the erased member's merge event) serves
      // under the re-elected min survivor 5
      assert(surviving === Map(5L -> 5L, 7L -> 5L, 20L -> 5L,
        21L -> 5L, 22L -> 5L))
      // an at-least-once REPLAY of batch 1 after the erasure: the
      // arriving batch is tombstone-filtered to {5}, the judge sees
      // the erased member nowhere, and the re-derived merge event is
      // 20 -> 5, overwriting the original 20 -> 3 — batch 2's standing
      // assignment (7 -> 3) still references the vanished label, so 7
      // strands in its own cluster: the DOCUMENTED divergence (erase
      // after the stream quiesces, or follow with a re-cluster)
      ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L))
      assert(surviving === Map(5L -> 5L, 20L -> 5L, 21L -> 5L,
        22L -> 5L, 7L -> 7L))
    } finally rmrf(dir)
  }

  test("reclusterFromPairs: the maintenance re-cluster converges a " +
      "diverged stream from surviving pair evidence and prunes the " +
      "remap log") {
    val dir = tmp("mclusterreclust")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      def batch(rows: (Long, Long)*) = rows.toSeq
        .map { case (id, h) => (id, "image", h) }
        .toDF("media_id", "modality", "h")
      def ingest(id: Long, rows: (Long, Long)*) =
        MediaClusterStore.applyClusterIngestBatch(batch(rows: _*), fp,
          cl, id, "spec-lineage")
      def surviving = MediaClusterStore
        .survivingAssignments(spark, cl)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // the erase-while-streaming divergence scenario, replayed
      ingest(0L, (20L, 0xFFFL), (21L, 0xFFFL), (22L, 0xFFFL))
      ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L))
      MediaClusterStore.deleteMembers(members(3L), cl, 0L)
      MediaDedupStore.deleteMedia(members(3L), fp, 0L)
      ingest(2L, (7L, 0xFC0L))
      ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L)) // replay -> 7 strands
      assert(surviving(7L) === 7L)
      // maintenance: re-cluster from the surviving pair evidence (the
      // scrubbed verdict relation; pairs naming 3 are filtered by the
      // op itself — defensive double-scrub)
      val evidence = Seq((20L, 21L), (20L, 22L), (21L, 22L), (3L, 5L),
        (3L, 20L), (5L, 20L), (5L, 21L), (5L, 22L), (5L, 7L),
        (7L, 20L), (7L, 21L), (7L, 22L))
        .map { case (a, b) => ("image", a, b) }
        .toDF("modality", "id_a", "id_b")
      MediaClusterStore.reclusterFromPairs(spark, cl, evidence, 2L)
      // converged: everyone (incl. the stranded 7) under min survivor 5
      assert(surviving === Map(5L -> 5L, 7L -> 5L, 20L -> 5L,
        21L -> 5L, 22L -> 5L))
      // fresh clustering has no merge history; one folded partition
      assert(!new java.io.File(s"$cl/_remaps").exists())
      val parts = new java.io.File(s"$cl/assignments").listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(parts === Seq("batch_id=2"))
      // and the erased member stays gone at the raw level too
      assert(!MediaClusterStore.assignmentsFromStore(spark, cl)
        .collect().map(_.getLong(0)).contains(3L))
    } finally rmrf(dir)
  }

  test("reclusterFromPairs is the STRICT erasure tier: clusters " +
      "bridged only by erased media split (standing reads keep them " +
      "together — topology historical)") {
    val dir = tmp("mclusterstrict")
    try {
      val store = dir.resolve("c").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L, 11L), prs((10L, 11L)), store, 0L)
      MediaClusterStore.applyClusterBatch(spark,
        members(30L), prs((30L, 10L)), store, 1L)
      MediaClusterStore.deleteMembers(members(10L), store, 0L)
      def surviving = MediaClusterStore
        .survivingAssignments(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // standing read: topology historical — 11 and 30 stay together
      // (the pair evidence concerned THEIR content), re-elected to 11
      assert(surviving === Map(11L -> 11L, 30L -> 11L))
      // strict tier: the only bridges named the erased 10, so after
      // scrub + re-cluster the evidence is gone and the cluster splits
      MediaClusterStore.reclusterFromPairs(spark, store,
        prs((10L, 11L), (30L, 10L)), 1L)
      assert(surviving === Map(11L -> 11L, 30L -> 30L))
    } finally rmrf(dir)
  }

  test("strict entry: the full recluster path reproduces the delete " +
      "entry on the planted corpus (every erased cluster there has ONE " +
      "survivor, so the historical and strict tiers coincide — the " +
      "10/11/30 spec above pins where they diverge)") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val del = asSet(MediaClusterStore.nqMediaClustersDelete(spark, sf0001))
    val strict = asSet(
      MediaClusterStore.nqMediaClustersStrict(spark, sf0001))
    assert(strict.nonEmpty)
    // a recluster that corrupted labels, resurrected an erased member,
    // or left a stale remap would break this equality
    assert(strict === del,
      s"diff = ${strict.diff(del) ++ del.diff(strict)}")
  }

  test("an all-tombstoned FIRST micro-batch leaves the FINGERPRINT " +
      "store readable too: the crawl loop survives its own empty " +
      "dynamic overwrite") {
    val dir = tmp("mfpempty")
    try {
      val fp = dir.resolve("fp").toString
      val cl = dir.resolve("cl").toString
      MediaDedupStore.deleteMedia(members(10L), fp, 0L)
      MediaClusterStore.deleteMembers(members(10L), cl, 0L)
      def batch(rows: (Long, Long)*) = rows.toSeq
        .map { case (id, h) => (id, "image", h) }
        .toDF("media_id", "modality", "h")
      // first batch filters to empty -> the fingerprint ingest writes
      // a file-less dir; the SECOND batch's judge must read it as an
      // empty store, not die on schema inference
      MediaClusterStore.applyClusterIngestBatch(
        batch((10L, 7L)), fp, cl, 0L, "spec-lineage")
      MediaClusterStore.applyClusterIngestBatch(
        batch((20L, 7L)), fp, cl, 1L, "spec-lineage")
      assert(clusters(cl) === Map(20L -> 20L))
      assert(MediaDedupStore.fingerprintsFromStore(spark, fp)
        .collect().map(_.getLong(0)).toSeq === Seq(20L))
    } finally rmrf(dir)
  }

  test("an EMPTY erasure request leaves the tombstone log readable " +
      "(a file-less log reads as no tombstones, store-family-wide)") {
    val dir = tmp("mtombempty")
    try {
      val store = dir.resolve("c").toString
      val fp = dir.resolve("fp").toString
      MediaClusterStore.applyClusterBatch(spark,
        members(10L), prs(), store, 0L)
      MediaDedupStore.applyFingerprintBatch(
        Seq((10L, "image", 7L)).toDF("media_id", "modality", "h"),
        fp, 0L)
      // an automated erasure pipeline matched zero keys
      MediaClusterStore.deleteMembers(members(), store, 0L)
      MediaDedupStore.deleteMedia(members(), fp, 0L)
      assert(clusters(store) === Map(10L -> 10L))
      assert(MediaClusterStore.survivingAssignments(spark, store)
        .count() === 1L)
      assert(MediaDedupStore.fingerprintsFromStore(spark, fp)
        .count() === 1L)
      // and a real erasure afterwards still lands and suppresses
      MediaClusterStore.deleteMembers(members(10L), store, 1L)
      assert(MediaClusterStore.survivingAssignments(spark, store)
        .count() === 0L)
    } finally rmrf(dir)
  }

  test("modality keys isolate JOINT batches: identical numeric ids " +
      "in different modalities never merge, remap or resolve across") {
    val dir = tmp("mclustermodal")
    try {
      val store = dir.resolve("c").toString
      def mixed(rows: (Long, String)*) =
        rows.toSeq.toDF("media_id", "modality")
      // one joint batch: image 7-8 pair; audio 7, 8 arrive as
      // singletons under the SAME numeric ids
      MediaClusterStore.applyClusterBatch(spark,
        mixed((7L, "image"), (8L, "image"), (7L, "audio"), (8L, "audio")),
        prs((7L, 8L)), store, 0L)
      def byKey = MediaClusterStore.assignmentsFromStore(spark, store)
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .toMap
      assert(byKey === Map((7L, "image") -> 7L, (8L, "image") -> 7L,
        (7L, "audio") -> 7L, (8L, "audio") -> 8L))
      // a later AUDIO bridge remaps audio 7 only — the image cluster
      // sharing the numeric label 7 must not resolve through it
      MediaClusterStore.applyClusterBatch(spark,
        mixed((5L, "audio")),
        Seq(("audio", 5L, 7L)).toDF("modality", "id_a", "id_b"),
        store, 1L)
      assert(byKey === Map((7L, "image") -> 7L, (8L, "image") -> 7L,
        (5L, "audio") -> 5L, (7L, "audio") -> 5L, (8L, "audio") -> 8L))
      // and modality-keyed erasure: deleting audio 8 leaves image 8
      MediaClusterStore.deleteMembers(
        mixed((8L, "audio")).select(col("media_id"), col("modality")),
        store, 0L)
      val surv = MediaClusterStore.survivingAssignments(spark, store)
        .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        .toMap
      assert(surv === Map((7L, "image") -> 7L, (8L, "image") -> 7L,
        (5L, "audio") -> 5L, (7L, "audio") -> 5L))
    } finally rmrf(dir)
  }

  // the affected-recluster fixture: b0 {10,11} pair -> cluster 10;
  // b1 {5} bridges via 11 -> remap 10 -> 5; b2 {20,21} -> cluster 20
  // (unaffected bystander); then 11 erases. Evidence = all 3 pairs.
  private def buildAffectedFixture(store: String): Unit = {
    MediaClusterStore.applyClusterBatch(spark,
      members(10L, 11L), prs((10L, 11L)), store, 0L)
    MediaClusterStore.applyClusterBatch(spark,
      members(5L), prs((5L, 11L)), store, 1L)
    MediaClusterStore.applyClusterBatch(spark,
      members(20L, 21L), prs((20L, 21L)), store, 2L)
    MediaClusterStore.deleteMembers(members(11L), store, 0L)
  }
  private def affectedEvidence = prs((10L, 11L), (5L, 11L), (20L, 21L))
  private def survivingOf(store: String) = MediaClusterStore
    .survivingAssignments(spark, store)
    .collect().map(r => (r.getLong(0), r.getLong(2))).toMap

  test("reclusterAffected equals the full recluster while touching " +
      "ONLY partitions holding an affected member (bystander " +
      "partition byte-untouched; remap entries into the affected " +
      "cluster drop)") {
    val dir = tmp("mclusteraffected")
    try {
      val store = dir.resolve("c").toString
      val twin = dir.resolve("t").toString
      buildAffectedFixture(store)
      buildAffectedFixture(twin)
      def fileState(p: String) = {
        val f = new java.io.File(p)
        if (!f.exists()) Map.empty[String, (Long, Long)]
        else f.listFiles().map(x =>
          x.getName -> (x.length(), x.lastModified())).toMap
      }
      val bystanderBefore = fileState(s"$store/assignments/batch_id=2")
      MediaClusterStore.reclusterAffected(spark, store, affectedEvidence)
      MediaClusterStore.reclusterFromPairs(spark, twin,
        affectedEvidence, 2L)
      // identical served clustering: the erased bridge's evidence is
      // gone, so {5, 10} split; the bystander cluster keeps its pair
      val expect = Map(5L -> 5L, 10L -> 10L, 20L -> 20L, 21L -> 20L)
      assert(survivingOf(store) === expect)
      assert(survivingOf(twin) === expect)
      // partition-targeted: the bystander partition's files are
      // byte-identical (same names, lengths, mtimes — never rewritten)
      assert(fileState(s"$store/assignments/batch_id=2")
        === bystanderBefore)
      // the affected remap (10 -> 5) dropped, and with it the log root
      assert(!new java.io.File(s"$store/_remaps").exists())
      // the erased member's row is PHYSICALLY scrubbed
      assert(spark.read.parquet(s"$store/assignments")
        .filter(col("media_id") === 11L).count() === 0L)
      // idempotent: nothing affected remains, a re-run is a no-op
      MediaClusterStore.reclusterAffected(spark, store, affectedEvidence)
      assert(survivingOf(store) === expect)
    } finally rmrf(dir)
  }

  test("reclusterAffected crash window: a run interrupted after the " +
      "remap drop is repaired by the standing plan on re-entry " +
      "(planning never trusts half-applied state)") {
    val dir = tmp("mclustercrash")
    try {
      val store = dir.resolve("c").toString
      buildAffectedFixture(store)
      // stage, then apply ONLY the remap half (the crash)
      assert(MediaClusterStore.stageReclusterPlan(spark, store,
        affectedEvidence).staged)
      MediaClusterStore.applyReclusterPlan(spark, store, phases = 1)
      // mid-crash state: remap gone, assignments un-rewritten — a
      // naive re-plan would now mis-detect 5 as unaffected (its raw
      // label no longer resolves into the erased member's cluster)
      assert(!new java.io.File(s"$store/_remaps").exists())
      // re-entry replays the AUTHORITATIVE plan first, then finds
      // nothing further affected
      MediaClusterStore.reclusterAffected(spark, store, affectedEvidence)
      assert(survivingOf(store) === Map(5L -> 5L, 10L -> 10L,
        20L -> 20L, 21L -> 20L))
      assert(spark.read.parquet(s"$store/assignments")
        .filter(col("media_id") === 11L).count() === 0L)
      assert(!new java.io.File(s"$store/_recluster_plan").exists())
    } finally rmrf(dir)
  }

  test("divergence-targeted recluster: a store diverged by an " +
      "erase-while-streaming replay repairs through reclusterAffected " +
      "at neighborhood cost — equal to reclusterFromPairs, bystander " +
      "partitions byte-untouched, crossing count surfaced") {
    val dir = tmp("mclusterdiverge")
    try {
      def build(tag: String): (String, String) = {
        val fp = dir.resolve(s"fp$tag").toString
        val cl = dir.resolve(s"cl$tag").toString
        def batch(rows: (Long, Long)*) = rows.toSeq
          .map { case (id, h) => (id, "image", h) }
          .toDF("media_id", "modality", "h")
        def ingest(id: Long, rows: (Long, Long)*) =
          MediaClusterStore.applyClusterIngestBatch(batch(rows: _*), fp,
            cl, id, "spec-lineage")
        // the MediaClusterStoreSpec erase-while-streaming scenario,
        // plus a BYSTANDER cluster in its own batch
        ingest(0L, (20L, 0xFFFL), (21L, 0xFFFL), (22L, 0xFFFL))
        ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L))
        MediaClusterStore.deleteMembers(members(3L), cl, 0L)
        MediaDedupStore.deleteMedia(members(3L), fp, 0L)
        ingest(2L, (7L, 0xFC0L))
        ingest(3L, (100L, 0xFFFFFF000000L), (101L, 0xFFFFFF000000L))
        ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L)) // the diverging replay
        (fp, cl)
      }
      val (_, cl) = build("a")
      val (_, twin) = build("b")
      def surviving(store: String) = MediaClusterStore
        .survivingAssignments(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // diverged: 7 stranded on the vanished label's cluster
      assert(surviving(cl)(7L) === 7L)
      // the erased member's raw rows were scrubbed by the replay, so
      // there is nothing tombstone-detectable — the OLD seeding
      // no-op'd here; crossing-evidence seeding is what repairs it
      val evidence = Seq((3L, 5L), (3L, 20L), (5L, 20L), (5L, 21L),
        (5L, 22L), (5L, 7L), (7L, 20L), (7L, 21L), (7L, 22L),
        (20L, 21L), (20L, 22L), (21L, 22L), (100L, 101L), (5L, 999L))
        .map { case (a, b) => ("image", a, b) }
        .toDF("modality", "id_a", "id_b")
      val bystanderBefore = {
        val f = new java.io.File(s"$cl/assignments/batch_id=3")
        f.listFiles().map(x =>
          x.getName -> (x.length(), x.lastModified())).toMap
      }
      val stats = MediaClusterStore.reclusterAffected(spark, cl, evidence)
      assert(stats.staged && stats.divergenceChecked)
      // the divergence signature is SURFACED: 4 crossing pairs
      // ((5,7) and 7 vs each of 20/21/22), two clusters seeded from
      // them, and the one absent-member pair reported as ignored
      assert(stats.crossingPairs === 4L, stats.toString)
      assert(stats.affectedClusters === 2L, stats.toString)
      assert(stats.unknownEndpointPairs === 1L, stats.toString)
      // repaired ≡ the full recluster on the twin
      MediaClusterStore.reclusterFromPairs(spark, twin, evidence, 3L)
      val expect = Map(5L -> 5L, 7L -> 5L, 20L -> 5L, 21L -> 5L,
        22L -> 5L, 100L -> 100L, 101L -> 100L)
      assert(surviving(cl) === expect)
      assert(surviving(twin) === expect)
      // neighborhood cost: the bystander cluster's partition was
      // never rewritten (same file names, lengths, mtimes)
      val bystanderAfter = {
        val f = new java.io.File(s"$cl/assignments/batch_id=3")
        f.listFiles().map(x =>
          x.getName -> (x.length(), x.lastModified())).toMap
      }
      assert(bystanderAfter === bystanderBefore)
      // nothing left to repair: a re-run stages nothing — and its
      // zero crossing count is an HONEST zero (detection ran)
      val again = MediaClusterStore.reclusterAffected(spark, cl, evidence)
      assert(!again.staged && again.divergenceChecked)
      assert(again.crossingPairs === 0L)
      assert(surviving(cl) === expect)
    } finally rmrf(dir)
  }

  test("forceDivergenceCheck repairs a diverged store whose tombstones " +
      "were AGED OUT by compaction — the case the default gate skips " +
      "(and honestly flags); still equals reclusterFromPairs") {
    val dir = tmp("mclusterforce")
    try {
      def build(tag: String): String = {
        val fp = dir.resolve(s"fp$tag").toString
        val cl = dir.resolve(s"cl$tag").toString
        def batch(rows: (Long, Long)*) = rows.toSeq
          .map { case (id, h) => (id, "image", h) }
          .toDF("media_id", "modality", "h")
        def ingest(id: Long, rows: (Long, Long)*) =
          MediaClusterStore.applyClusterIngestBatch(batch(rows: _*), fp,
            cl, id, "spec-lineage")
        ingest(0L, (20L, 0xFFFL), (21L, 0xFFFL), (22L, 0xFFFL))
        ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L))
        MediaClusterStore.deleteMembers(members(3L), cl, 0L)
        MediaDedupStore.deleteMedia(members(3L), fp, 0L)
        ingest(2L, (7L, 0xFC0L))
        ingest(3L, (100L, 0xFFFFFF000000L), (101L, 0xFFFFFF000000L))
        ingest(1L, (3L, 0xFC0L), (5L, 0xFC0L)) // diverging replay
        // compaction ages the tombstone out (3's raw rows were
        // scrubbed by the replay, so no copy survives the fold) —
        // the divergence now has nothing tombstone-detectable
        MediaClusterStore.compactThrough(spark, cl, through = 3L)
        assert(!new java.io.File(s"$cl/_cluster_tombstones").exists())
        cl
      }
      val cl = build("a")
      val twin = build("b")
      def surviving(store: String) = MediaClusterStore
        .survivingAssignments(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(surviving(cl)(7L) === 7L, "diverged")
      val evidence = Seq((3L, 5L), (3L, 20L), (5L, 20L), (5L, 21L),
        (5L, 22L), (5L, 7L), (7L, 20L), (7L, 21L), (7L, 22L),
        (20L, 21L), (20L, 22L), (21L, 22L), (100L, 101L))
        .map { case (a, b) => ("image", a, b) }
        .toDF("modality", "id_a", "id_b")
      // the default gate skips — and SAYS so (never a clean-looking 0)
      val skipped = MediaClusterStore.reclusterAffected(spark, cl,
        evidence)
      assert(!skipped.staged && !skipped.divergenceChecked)
      assert(surviving(cl)(7L) === 7L)
      // forced: crossing-evidence seeding carries the whole detection
      val stats = MediaClusterStore.reclusterAffected(spark, cl,
        evidence, forceDivergenceCheck = true)
      assert(stats.staged && stats.divergenceChecked)
      assert(stats.crossingPairs === 4L, stats.toString)
      // the two pairs naming the erased (and aged-out) member 3 are
      // unknown-endpoint evidence — ignored and surfaced
      assert(stats.unknownEndpointPairs === 2L, stats.toString)
      MediaClusterStore.reclusterFromPairs(spark, twin, evidence, 3L)
      val expect = Map(5L -> 5L, 7L -> 5L, 20L -> 5L, 21L -> 5L,
        22L -> 5L, 100L -> 100L, 101L -> 100L)
      assert(surviving(cl) === expect)
      assert(surviving(twin) === expect)
    } finally rmrf(dir)
  }

  test("affected entry equals the strict entry (restricted recompute " +
      "indistinguishable from the full one)") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val strict = asSet(
      MediaClusterStore.nqMediaClustersStrict(spark, sf0001))
    val affected = asSet(
      MediaClusterStore.nqMediaClustersAffected(spark, sf0001))
    assert(affected.nonEmpty)
    assert(affected === strict,
      s"diff = ${affected.diff(strict) ++ strict.diff(affected)}")
  }

  test("joint entry: ONE batch of image+audio+video fingerprints " +
      "through one judge→merge→ingest pass equals the three " +
      "single-modality cluster entries' union — no per-modality " +
      "orchestration, no cross-modality contamination") {
    def asSet(df: org.apache.spark.sql.DataFrame, m: String) =
      df.collect().map(r => (m, r.getLong(0), r.getLong(1),
        r.getBoolean(2))).toSet
    val joint = MediaClusterStore.nqMediaClustersJoint(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    val expected =
      asSet(MediaClusterStore.nqMediaClustersInc(spark, sf0001), "image") ++
      asSet(MediaClusterStore.nqAudioClustersInc(spark, sf0001), "audio") ++
      asSet(MediaClusterStore.nqVideoClustersInc(spark, sf0001), "video")
    assert(joint.nonEmpty)
    assert(Set("image", "audio", "video").subsetOf(joint.map(_._1)))
    assert(joint === expected,
      s"diff = ${joint.diff(expected) ++ expected.diff(joint)}")
  }

  test("audio member: the incremental cluster path equals the " +
      "one-shot connected components over the audio pair relation") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val inc = asSet(MediaClusterStore.nqAudioClustersInc(spark, sf0001))
    val clips = graft.audio.AudioDedup.generateDedupClips(spark, sf0001)
    val fps = graft.audio.AudioDedup.fingerprints(clips)
      .localCheckpoint()
    val pairs = ImageDedup.nearDupPairs(
        fps.withColumnRenamed("clip_id", "image_id"))
      .select(col("img_a").as("d1"), col("img_b").as("d2"))
    val oneShot = asSet(graft.text.DedupClusters.connectedComponents(
        fps.select(col("clip_id").as("doc_id")), pairs)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_keeper")))
    assert(inc.nonEmpty)
    assert(inc.exists { case (id, cl, _) => id != cl })
    assert(inc === oneShot,
      s"diff = ${inc.diff(oneShot) ++ oneShot.diff(inc)}")
  }

  test("video member: the incremental keyframe cluster path equals " +
      "the one-shot connected components over cross-video reuse pairs") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val inc = asSet(MediaClusterStore.nqVideoClustersInc(spark, sf0001))
    val fps = VideoDedup.keyframeFingerprints(spark, sf0001)
      .localCheckpoint()
    val pairs = ImageDedup.nearDupPairs(
        fps.select(col("media_id").as("image_id"), col("h")))
      .filter(expr("img_a DIV 100") =!= expr("img_b DIV 100"))
      .select(col("img_a").as("d1"), col("img_b").as("d2"))
    val oneShot = asSet(graft.text.DedupClusters.connectedComponents(
        fps.select(col("media_id").as("doc_id")), pairs)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_keeper")))
    assert(inc.nonEmpty)
    assert(inc.exists { case (id, cl, _) => id != cl })
    assert(inc === oneShot,
      s"diff = ${inc.diff(oneShot) ++ oneShot.diff(inc)}")
  }

  test("cluster-merge serving entry: repeat runs are idempotent " +
      "replays and planted synthetic copies cluster with their bases") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = asMap(MediaClusterStore.nqClusterMerge(spark, sf0001))
    // the timed path re-applies batch 19 every run — fenced reads make
    // the repeat a byte-idempotent replay, not a drifting store
    val again = asMap(MediaClusterStore.nqClusterMerge(spark, sf0001))
    assert(first === again)
    val base7 = first.keys.filter(m =>
      m < 10000001L && m % 7 == 0).toSeq
    assert(base7.nonEmpty)
    base7.foreach { m =>
      assert(first(m + 10000001L) === first(m),
        s"planted ≤3-bit copy of $m not clustered with its base")
    }
  }

  test("incremental entry equals the one-shot connected components " +
      "(the q63 shape) over the planted image corpus") {
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val inc = asSet(MediaClusterStore.nqMediaClustersInc(spark, sf0001))
    val oneShot = asSet(ImageDedup.nqImageDedupClusters(spark, sf0001))
    assert(inc.nonEmpty)
    assert(inc === oneShot,
      s"diff = ${inc.diff(oneShot) ++ oneShot.diff(inc)}")
    // sanity: real multi-member clusters exist and keepers are minima
    assert(inc.exists { case (id, cl, _) => id != cl })
    assert(inc.forall { case (id, cl, k) => k == (id == cl) })
  }
}
