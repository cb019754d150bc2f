package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The ingest gate must be the batch quality stack verbatim: streaming
  * run ≡ batch run of the SAME function, and both ≡ the independent
  * batch components (q75 gates, lmScore) they claim to reuse.
  */
class IngestGateSpec extends SparkSpec {
  import spark.implicits._

  // spread docs over minutes of event time so multiple windows open
  private val tsExpr = expr("timestamp_micros(doc_id * 60000000)")

  private def batchDocs =
    graft.Tables.documents(spark, sf0001).withColumn("ts", tsExpr)

  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/documents.parquet"),
      dir.resolve("documents.parquet"))
    dir.toString
  }

  private def streamDocs = {
    val schema = spark.read.parquet(s"$sf0001/documents.parquet").schema
    spark.readStream.schema(schema).parquet(streamDir).withColumn("ts", tsExpr)
  }

  // frozen calibration artifacts, computed ONCE in batch
  private lazy val lm = graft.text.TrainPrep.bigramLm(
    graft.Tables.documents(spark, sf0001).filter($"doc_id" % 5 =!= 0))
    .localCheckpoint()
  private lazy val thresholds = graft.text.TrainPrep.ccnetThresholds(
    batchDocs.select($"doc_id", $"lang")
      .join(graft.text.TrainPrep.lmScore(
        graft.Tables.documents(spark, sf0001), lm)
        .select("doc_id", "avg_nll"), Seq("doc_id")))
    .localCheckpoint()

  private val outCols = Seq("doc_id", "lang", "keep_gopher", "n_bigrams",
    "avg_nll", "bucket", "keep")

  test("ingest gate: streaming run equals the batch run of the same code") {
    val q = IngestGate.gateStream(streamDocs, lm, thresholds)
      .writeStream.outputMode("complete")
      .format("memory").queryName("gate_s")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("gate_s")
      .select(outCols.map(col): _*).orderBy("doc_id")
      .collect()
    val batch = IngestGate.gateStream(batchDocs, lm, thresholds)
      .select(outCols.map(col): _*).orderBy("doc_id")
      .collect()
    assert(batch.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("ingest gate: verdict components equal their batch operators") {
    val out = IngestGate.gateStream(batchDocs, lm, thresholds).cache()
    val docs = graft.Tables.documents(spark, sf0001)
    assert(out.count() === docs.count(), "one verdict per document")
    // gates ≡ q75 (same gopherGates code, but prove it end-to-end)
    val q75 = graft.text.QualityRules.q75GopherRules(spark, sf0001)
      .select($"doc_id", $"keep".as("k75"))
    assert(out.join(q75, "doc_id")
      .filter($"keep_gopher" =!= $"k75").count() === 0)
    // scores ≡ batch lmScore under the same frozen LM
    val ls = graft.text.TrainPrep.lmScore(docs, lm)
      .select($"doc_id", $"avg_nll".as("nll_batch"))
    assert(out.join(ls, "doc_id")
      .filter(!($"avg_nll" <=> $"nll_batch")).count() === 0)
    // the tail cut really cuts: keep implies gates AND a non-tail bucket
    assert(out.filter($"keep" &&
      (!$"keep_gopher" || !$"bucket".isin("head", "middle"))).count() === 0)
    // and buckets exist on all three tiers somewhere in the corpus
    assert(out.select("bucket").distinct().collect().map(_.getString(0))
      .toSet.intersect(Set("head", "middle", "tail")) === Set("head", "middle", "tail"))
    out.unpersist()
  }

  test("ingest gate: unscorable docs get keep=false (never null) + verdict") {
    // 64 words, mean length 3.0, all-alpha, 8 distinct stopwords: passes
    // every Gopher gate — but lang zz has no threshold row, so the
    // bucket is null ("unknown"). Pre-fix, keep was true && null = NULL
    // and the doc vanished from BOTH filter(keep) and filter(!keep).
    val passingText = Seq.fill(8)("the be to of and that have with")
      .mkString(" ")
    val docs = Seq(
      (9001L, "hi", "en"), // 1 token: no bigrams AND gates fail
      (9002L, passingText, "zz")) // gates pass, unknown language
      .toDF("doc_id", "text", "lang").withColumn("ts", tsExpr)
    val out = IngestGate.gateStream(docs, lm, thresholds)
      .select("doc_id", "keep_gopher", "bucket", "keep", "verdict")
      .cache()
    assert(out.filter($"keep".isNull).count() === 0, "keep is never null")
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    val short = byId(9001L)
    assert(!short.getBoolean(3) && short.getString(4) === "reject")
    val unk = byId(9002L)
    assert(unk.getBoolean(1), "fixture must pass the Gopher gates")
    assert(unk.isNullAt(2), "unknown lang must yield a null bucket")
    assert(!unk.getBoolean(3) && unk.getString(4) === "unknown")
    // admitted/rejected now PARTITION the input
    assert(out.filter($"keep").count() + out.filter(!$"keep").count()
      === out.count())
    out.unpersist()
  }
}
