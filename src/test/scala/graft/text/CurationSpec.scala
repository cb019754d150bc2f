package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed curation pipeline must be consistent with each gate it
  * is assembled from, and its accounting must cover the corpus exactly.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val curated = Curation.curate(spark, sf0001).cache()

  test("every doc appears exactly once with a decision") {
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(curated.count() === nDocs)
    assert(curated.select("doc_id").distinct().count() === nDocs)
    val bad = curated.filter(col("keep") && col("drop_reason").isNotNull)
      .count()
    assert(bad === 0)
  }

  test("exact_dup gate: dup copies drop, the min-id original is kept") {
    // the driver corpus has no byte-identical dups (only mutated
    // near-dups), so the exact gate is pinned on a fixture: doc 1000 is
    // a byte-identical copy of doc 0, doc 1001 of doc 1
    val docs = graft.Tables.documents(spark, sf0001)
    val copies = docs.filter(col("doc_id") < 2)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("curdocs").toString
    docs.unionByName(copies).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val cur = Curation.curate(spark, dir).cache()
    val dupRows = cur.filter(col("doc_id") >= 1000L)
      .select("drop_reason").as[String].collect()
    assert(dupRows.toSet === Set("exact_dup"),
      s"copies must drop as exact_dup: ${dupRows.mkString(",")}")
    val originals = cur.filter(col("doc_id") < 2)
      .select("drop_reason").as[String].collect()
    assert(!originals.contains("exact_dup"),
      "min-id originals must not be flagged exact_dup")
    cur.unpersist()
  }

  test("near_dup drops share a cluster with exactly one keeper") {
    val byCluster = curated
      .groupBy("cluster_id")
      .agg(sum(when(col("drop_reason") === "near_dup", 1).otherwise(0))
        .as("n_near_dropped"),
        sum(when(col("keep") || col("drop_reason") === "low_quality", 1)
          .otherwise(0)).as("n_keeper_side"))
      .filter(col("n_near_dropped") > 0)
    // a cluster that dropped near-dups must still have its keeper row
    // (which may itself fail quality later — that's a different reason)
    assert(byCluster.filter(col("n_keeper_side") === 0).count() === 0)
  }

  test("repetition gate drops looping text, leaves the default pipeline untouched") {
    val docs = graft.Tables.documents(spark, sf0001)
    // doc 2000: one 3-gram repeated 50x -> rep_ratio ~ 1.0 but high
    // token count and ok-ish distinct ratio sneak past the other gates?
    // (distinct_ratio = 3/152 would trip low_quality, so pad with
    // unique filler to keep distinct_ratio above the 0.2 default)
    val filler = (0 until 60).map(i => s"unique$i").mkString(" ")
    val looping = s"$filler " + Seq.fill(50)("spam spam spam").mkString(" ")
    val extra = Seq((2000L, looping, "en", "web", looping.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dirPath = java.nio.file.Files.createTempDirectory("repdocs")
    val dir = dirPath.toString
    val gated = try {
      docs.unionByName(extra).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val g = Curation.curate(spark, dir, maxRepRatio = Some(0.2)).cache()
      val verdict = g.filter(col("doc_id") === 2000L)
        .select("drop_reason").as[String].head()
      assert(verdict === "repetitive", s"looping doc got: $verdict")
      // the gate must not change any OTHER doc's outcome at this
      // threshold vs the ungated run (corpus docs are word salad, far
      // from 0.2)
      val ungated = Curation.curate(spark, dir)
      assert(g.filter(col("doc_id") < 2000L).select("doc_id", "keep")
        .exceptAll(ungated.filter(col("doc_id") < 2000L)
          .select("doc_id", "keep")).isEmpty)
      g
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    gated.unpersist()
  }

  test("null text classifies low_quality instead of failing the job (r18)") {
    // a 100 TB crawl WILL contain null text rows; the quality gate's
    // typed tokenization pass must keep the pre-UDF expression form's
    // null tolerance (0 tokens / null ratio → low_quality), not NPE
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    val nullDoc = Seq((90000L, null.asInstanceOf[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dirPath = java.nio.file.Files.createTempDirectory("nulldocs")
    try {
      docs.unionByName(nullDoc).coalesce(1).write.mode("overwrite")
        .parquet(s"$dirPath/documents.parquet")
      val cur = Curation.curate(spark, dirPath.toString)
      assert(cur.count() === 51, "the null-text doc must not vanish")
      val row = cur.filter(col("doc_id") === 90000L)
        .select("n_tokens", "drop_reason").head()
      assert(row.getLong(0) === 0L, s"null text must count 0 tokens: $row")
      assert(row.getString(1) === "low_quality", s"got: $row")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("q64 exact-path variant agrees with the banded pipeline on this corpus") {
    // q64 swaps the near-dup stage to the exact-jaccard pair relation
    // (its DuckDB oracle needs determinism); on a corpus where MinHash
    // banding has full recall — pinned by NearDupSpec — every gate
    // decision must come out identical
    val exact = Curation.q64Curation(spark, sf0001)
    assert(exact.exceptAll(curated).isEmpty &&
      curated.exceptAll(exact).isEmpty,
      "exact-path and banded curation must agree row-for-row here")
  }

  test("stats partition the corpus and reconcile with the decisions") {
    val stats = Curation.curationStats(curated)
      .as[(String, Long)].collect().toMap
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(stats.values.sum === nDocs)
    assert(stats("kept") === curated.filter(col("keep")).count())
    assert(stats.keySet.subsetOf(
      Set("kept", "exact_dup", "near_dup", "low_quality")))
  }
}
