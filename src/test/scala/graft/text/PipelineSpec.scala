package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed end-to-end pipeline entry (nq_pipeline_e2e): coverage,
  * precedence, agreement with the stage entries it composes, and the
  * survivor-pack arithmetic. The two drop reasons the driver corpus
  * cannot produce (no byte-identical copies, no fully-duplicated doc)
  * are pinned on fixtures.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = Pipeline.nqPipelineE2e(spark, sf0001).cache()

  test("every doc appears exactly once; kept <=> reason is null; " +
      "dropped docs carry no pack columns") {
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(out.count() === nDocs)
    assert(out.select("doc_id").distinct().count() === nDocs)
    assert(out.filter(col("kept") =!= col("reason").isNull).count() === 0)
    assert(out.filter(!col("kept") && (col("shard").isNotNull ||
      col("pack_id").isNotNull)).count() === 0)
    assert(out.filter(col("kept") && (col("shard").isNull ||
      col("pack_id").isNull || col("pack_offset").isNull)).count() === 0)
  }

  test("stage agreement: near_dup matches the cluster store's " +
      "non-keepers among gate survivors; mix_out matches q74's " +
      "complement; gopher matches the structural-rule subset") {
    val gates = QualityRules.gopherGates(
        graft.Tables.documents(spark, sf0001))
      .select(col("doc_id"),
        (col("n_tokens").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("frac_symbol_words") <= 0.1 &&
          col("frac_alpha_words") >= 0.8 &&
          col("frac_bullet_lines") <= 0.9 &&
          col("frac_ellipsis_lines") <= 0.3).as("g"))
    val joined = out.join(gates, "doc_id")
    assert(joined.filter((col("reason") === "gopher") =!= !col("g"))
      .count() === 0, "gopher verdicts must equal the rule subset")
    val keepers = DedupClusters.dedupClusters(spark, sf0001)
      .select(col("doc_id"), col("is_keeper"))
    assert(out.filter(col("reason") === "near_dup").join(keepers, "doc_id")
      .filter(col("is_keeper")).count() === 0,
      "a near_dup drop must not be its cluster's keeper")
    val mixIds = Mixing.temperatureMix(
        graft.Tables.documents(spark, sf0001), "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val mixOut = out.filter(col("reason") === "mix_out")
      .select("doc_id").as[Long].collect()
    assert(mixOut.forall(id => !mixIds.contains(id)),
      "mix_out must be q74's complement on its survivors")
  }

  test("pack: per (lang, shard) the kept docs' offsets are the exact " +
      "running sum of post-cut token counts in doc_id order") {
    val cut = SubstrDedup.q76SubstrCut(spark, sf0001)
      .select(col("doc_id"), col("n_tokens_kept"))
    val kept = out.filter(col("kept")).join(cut, "doc_id")
      .select("lang", "shard", "doc_id", "pack_id", "pack_offset",
        "n_tokens_kept")
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    assert(kept.nonEmpty)
    kept.foreach { case ((lang, shard), rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(3) === cum / 2048 && r.getLong(4) === cum % 2048,
          s"($lang, $shard) doc ${r.getLong(2)}: expected start $cum")
        cum += r.getLong(5)
      }
    }
  }

  test("fixture: a byte-identical copy drops as exact_dup and a " +
      "fully-duplicated doc drops as substr_dup; gopher takes " +
      "precedence over both") {
    val docs = graft.Tables.documents(spark, sf0001)
    // exact-dup donor: any real doc that clears the structural gate
    // (the corpus tops out near 99 tokens, so slices of real docs
    // cannot stay under the 0.5 near-dup jaccard bar — the substr_dup
    // case gets a long SYNTHETIC donor instead: a 60-token slice of a
    // 300-token doc is fully gram-covered at jaccard ~0.2)
    val base = docs
      .withColumn("nt", size(split(col("text"), "\\s+")))
      .filter(col("nt").between(60, 99)).orderBy("doc_id").limit(1)
      .select("text").as[String].head()
    val donor = (0 until 300).map(i => s"tok${i}xy").mkString(" ")
    val slice = donor.split(" ").slice(100, 160).mkString(" ")
    val fixture = docs.unionByName(Seq(
      // the synthetic donor (earlier id than its slice)
      (100006L, donor, "en", "web", donor.length.toLong),
      // byte-identical copy of a real gate-passing doc
      (100007L, base, "en", "web", base.length.toLong),
      // a contiguous 60-token slice of the donor: not an exact dup,
      // not a near dup (jaccard 58/298), but every 20-gram repeats
      (100008L, slice, "en", "web", slice.length.toLong),
      // a short junk doc that is also a byte-dup of another junk doc:
      // gopher fires first (precedence)
      (100009L, "tiny doc", "en", "web", 8L),
      (100010L, "tiny doc", "en", "web", 8L),
      // null text: NULL metrics on both engines must deterministically
      // drop as 'gopher', never fall through the precedence CASE
      (100011L, null.asInstanceOf[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("pipedocs")
    try {
      fixture.coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val v = Pipeline.nqPipelineE2e(spark, dir.toString)
        .select("doc_id", "reason")
        .filter(col("doc_id") >= 100000L)
        .as[(Long, String)].collect().toMap
      assert(v(100007L) === "exact_dup", s"got ${v(100007L)}")
      assert(v(100008L) === "substr_dup", s"got ${v(100008L)}")
      assert(v(100009L) === "gopher" && v(100010L) === "gopher",
        "gopher precedes exact_dup in pipeline order")
      assert(v(100011L) === "gopher", "null text must drop as gopher")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
