package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // 60 plain English-ish words: passes every Gopher gate
  private val goodText: String =
    (("the be to of and that have with" + " alpha beta gamma delta") * 5)
      .trim.split("\\s+").take(60).mkString(" ") + " " +
      (1 to 20).map(i => s"word$i").mkString(" ")

  private def run(rows: Seq[(Long, String)]) = {
    val docs = rows.map { case (id, t) => (id, t, "en", "src", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    QualityRules.q75GopherRules(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("q75: each Gopher gate rejects its planted violation, good doc passes") {
    val bullets = (1 to 60).map(i => s"- item$i the of").mkString("\n")
    val ellipsis = (1 to 60).map(i => s"the of and line$i ...").mkString("\n")
    val out = run(Seq(
      0L -> goodText,                                    // passes all gates
      1L -> "too short the of",                          // < 50 tokens
      2L -> (goodText + " " + "x " * 300),               // mean word len < 3
      3L -> (goodText + " " + (1 to 80).map(i => s"##tag$i#").mkString(" ")), // symbols
      4L -> (goodText + " " + (1 to 400).map(_.toString).mkString(" ")), // digits: alpha frac < .8
      5L -> bullets,                                     // >90% bullet lines
      6L -> ellipsis,                                    // >30% ellipsis lines
      7L -> (1 to 60).map(i => s"word$i").mkString(" ") // no stopwords
    ))
    assert(out(0L).getAs[Boolean]("keep"), s"good doc must pass: ${out(0L)}")
    for (id <- 1L to 7L)
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id must fail: ${out(id)}")
    // and the per-rule columns name the actual culprit
    assert(out(1L).getAs[Long]("n_tokens") < 50)
    assert(out(2L).getAs[Double]("mean_word_len") < 3.0)
    assert(out(3L).getAs[Double]("frac_symbol_words") > 0.1)
    assert(out(4L).getAs[Double]("frac_alpha_words") < 0.8)
    assert(out(5L).getAs[Double]("frac_bullet_lines") > 0.9)
    assert(out(6L).getAs[Double]("frac_ellipsis_lines") > 0.3)
    assert(out(7L).getAs[Long]("n_stopwords") < 2)
  }

  test("q75: empty and whitespace-only docs are rejected without dividing by zero") {
    val out = run(Seq(0L -> "", 1L -> "   "))
    for (id <- 0L to 1L) {
      assert(!out(id).getAs[Boolean]("keep"))
      assert(out(id).getAs[Double]("mean_word_len") === 0.0)
      assert(out(id).getAs[Double]("frac_alpha_words") === 0.0)
    }
  }

  test("q75: corpus run — one verdict per doc, gates are narrow scan-speed exprs") {
    val df = QualityRules.q75GopherRules(spark, sf0001)
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(df.count() === n)
    // plan shape: no joins, no aggregates — a pure projection + sort
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = df.queryExecution.optimizedPlan
    assert(lp.collect { case j: Join => j }.isEmpty, "no joins expected")
    assert(lp.collect { case a: Aggregate => a }.isEmpty, "no aggs expected")
  }
}
