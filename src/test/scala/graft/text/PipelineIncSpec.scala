package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental pipeline through the standing stores
  * (nq_pipeline_inc): at-ingest ≡ one-shot on a fixture corpus with
  * exact/near/substring duplicates planted ACROSS batch boundaries,
  * append-only pack offsets across 3 batches, retry idempotence, and
  * the below-high-water refusal.
  *
  * The fixture plants NO retroactive cluster bridges (no later doc
  * merges two standing clusters), so every at-ingest verdict equals
  * the full-corpus one-shot verdict and the WHOLE log can be compared
  * against nq_pipeline_e2e — the strongest available equality. (With
  * bridges only the final batch's verdict columns are comparable; the
  * oracle's per-batch prefix chains cover that general case.)
  */
class PipelineIncSpec extends SparkSpec {
  import spark.implicits._

  // 90 base docs in 3 id-terciles (0-29 / 30-59 / 60-89), mostly-unique
  // token sets so no accidental near-dups; planted:
  //   doc 40 (b1) byte-identical to doc 6 (b0)      → exact_dup
  //   doc 70 (b2) byte-identical to doc 5 (b0)      → exact_dup
  //   doc 71 (b2) 50/60 tokens shared with doc 7 (b0) → near_dup
  //   doc 74 (b2) a 60-token contiguous slice of the
  //     300-token donor doc 9 (b0): every 20-gram repeats, jaccard
  //     ~0.2 (below the near-dup bar)               → substr_dup
  private def tokens(i: Long, n: Int): Seq[String] =
    (0 until n).map(j => s"w${i}a$j")

  private lazy val fixtureDocs: Seq[(Long, String, String, String, Long)] = {
    val base = (0L until 90L).map { i =>
      val n = if (i == 9L) 300 else 60
      (i, tokens(i, n).mkString(" "))
    }.toMap
    val planted = Map(
      40L -> base(6L),
      70L -> base(5L),
      71L -> (tokens(7L, 60).take(50) ++
        (0 until 10).map(j => s"x71b$j")).mkString(" "),
      74L -> base(9L).split(" ").slice(100, 160).mkString(" "))
    (0L until 90L).map { i =>
      val text = planted.getOrElse(i, base(i))
      val lang = if (i % 3 == 0) "fr" else "en"
      (i, text, lang, "web", text.length.toLong)
    }
  }

  private def withFixture[T](f: (String, String) => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("pipeinc")
    try {
      fixtureDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val root = java.nio.file.Files
        .createTempDirectory("pipeincstore").toString
      f(dir.toString, root)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def batches(d: String) = {
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "lang", "text")
    Seq(
      docs.filter(col("doc_id") < 30),
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 60),
      docs.filter(col("doc_id") >= 60))
  }

  test("store path ≡ one-shot: per-batch at-ingest verdicts and " +
      "append-only offsets reproduce nq_pipeline_e2e on a corpus " +
      "with cross-batch planted duplicates") {
    withFixture { (d, root) =>
      val docs = graft.Tables.documents(spark, d)
      PipelineInc.freezeRates(docs, root)
      val emitted = batches(d).zipWithIndex.map { case (b, i) =>
        PipelineInc.judgeAndIngest(b, root, i.toLong).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
            Option(r.getString(3)), Option(r.get(4)), Option(r.get(5)),
            Option(r.get(6))))
      }
      val log = PipelineInc.verdictLog(spark, root)
        .select("doc_id", "lang", "kept", "reason", "shard", "pack_id",
          "pack_offset")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
          Option(r.getString(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6))))
      // append-only literally: the standing log serves each batch's
      // rows exactly as they were emitted at its ingest
      assert(log.toSet === emitted.flatten.toSet)
      assert(log.length === 90)
      // no retro bridges planted ⇒ the whole log equals the one-shot
      // pipeline (verdicts AND pack columns)
      val oneShot = Pipeline.nqPipelineE2e(spark, d).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
          Option(r.getString(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6))))
      assert(log.toSet === oneShot.toSet,
        "store path must reproduce the one-shot pipeline")
      // the planted cross-boundary duplicates, by reason
      val reasons = log.map(t => t._1 -> t._4).toMap
      assert(reasons(40L) === Some("exact_dup"),
        "b1 copy of a b0 doc must drop via the standing fp store")
      assert(reasons(70L) === Some("exact_dup"))
      assert(reasons(71L) === Some("near_dup"),
        "b2 near-copy of a b0 doc must drop via the standing " +
          "signature store + cluster assignments")
      assert(reasons(74L) === Some("substr_dup"),
        "b2 slice of a b0 donor must drop via the standing gram store")
      // donors (first occurrences) never drop as duplicates — they may
      // still be mix_out (the frozen-rate hash draw is orthogonal)
      val dupReasons: Set[Option[String]] =
        Set(Some("exact_dup"), Some("near_dup"), Some("substr_dup"))
      assert(Seq(5L, 6L, 7L, 9L).forall(i => !dupReasons(reasons(i))),
        "donors (first occurrences) must not drop as duplicates")
    }
  }

  test("pack offsets are the exact cross-batch running sums per " +
      "(lang, shard) — each batch continues from the standing " +
      "watermark, never renumbering history") {
    withFixture { (d, root) =>
      val docs = graft.Tables.documents(spark, d)
      PipelineInc.freezeRates(docs, root)
      batches(d).zipWithIndex.foreach { case (b, i) =>
        PipelineInc.judgeAndIngest(b, root, i.toLong)
      }
      // substring-kept counts are backward-looking (first-occurrence
      // rule), so the one-shot cut supplies every doc's at-ingest count
      val cut = SubstrDedup.q76SubstrCut(spark, d)
        .select(col("doc_id"), col("n_tokens_kept"))
      val kept = PipelineInc.verdictLog(spark, root)
        .filter(col("kept")).join(cut, "doc_id")
        // the partition column reads back as INT — normalize
        .withColumn("batch_id", col("batch_id").cast("long"))
        .select("lang", "shard", "batch_id", "doc_id", "pack_id",
          "pack_offset", "n_tokens_kept")
        .collect()
        .groupBy(r => (r.getString(0), r.getLong(1)))
      assert(kept.nonEmpty)
      kept.foreach { case ((lang, shard), rows) =>
        var cum = 0L
        rows.sortBy(r => (r.getLong(2), r.getLong(3))).foreach { r =>
          assert(r.getLong(4) === cum / 2048 &&
            r.getLong(5) === cum % 2048,
            s"($lang, $shard) doc ${r.getLong(3)} (batch " +
              s"${r.getLong(2)}): expected start $cum")
          cum += r.getLong(6)
        }
      }
    }
  }

  test("a crash retry under the same batch id is byte-idempotent; " +
      "re-judging below the log's high-water id refuses loudly") {
    withFixture { (d, root) =>
      val docs = graft.Tables.documents(spark, d)
      PipelineInc.freezeRates(docs, root)
      val bs = batches(d)
      bs.zipWithIndex.foreach { case (b, i) =>
        PipelineInc.judgeAndIngest(b, root, i.toLong)
      }
      val before = PipelineInc.verdictLog(spark, root).collect().toSet
      PipelineInc.judgeAndIngest(bs(2), root, 2L) // retry, same id
      assert(PipelineInc.verdictLog(spark, root).collect().toSet ===
        before, "same-id retry must not change the log")
      val e = intercept[IllegalArgumentException] {
        PipelineInc.judgeAndIngest(bs(1), root, 1L)
      }
      assert(e.getMessage.contains("high-water"))
    }
  }
}
