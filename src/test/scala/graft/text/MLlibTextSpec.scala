package graft.text

import graft.SparkSpec
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel,
  IDF, NGram, RegexTokenizer, StopWordsRemover}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

/** SURVEY §2.K text-analysis, MLlib estimator route: Tokenizer →
  * StopWordsRemover → (NGram | CountVectorizer → IDF). Cross-checked
  * against the engine's relational TF-IDF (q40's plan shape) computed
  * with MLlib's smoothed idf = ln((n+1)/(df+1)) on the same fixture —
  * the two routes must crown the same top term per document.
  */
class MLlibTextSpec extends SparkSpec {
  import spark.implicits._

  // English stopwords + one distinctive content word per doc, repeated so
  // tf separates it decisively; "shared" appears everywhere (high df → low
  // idf) so stopword-like mass also exists inside the vocabulary.
  private lazy val docs = Seq(
    (0L, "the a of spark spark spark shared and the"),
    (1L, "the a of catalyst catalyst catalyst shared and of"),
    (2L, "the a of tungsten tungsten tungsten shared and a"),
    (3L, "the a of shuffle shuffle shuffle shared and the")
  ).toDF("doc_id", "text")

  private lazy val tok = new RegexTokenizer().setPattern("\\s+")
    .setToLowercase(false).setInputCol("text").setOutputCol("words")
  private lazy val sw = new StopWordsRemover()
    .setInputCol("words").setOutputCol("filtered")

  test("StopWordsRemover drops English stopwords, keeps content terms") {
    val out = sw.transform(tok.transform(docs))
    val kept = out.select(explode($"filtered").as("t"))
      .distinct().as[String].collect().toSet
    assert(kept === Set("spark", "catalyst", "tungsten", "shuffle", "shared"))
  }

  test("estimator TF-IDF route agrees with the relational route on top terms") {
    val cv = new CountVectorizer().setInputCol("filtered").setOutputCol("tfv")
    val idf = new IDF().setInputCol("tfv").setOutputCol("tfidfv")
    val model = new Pipeline().setStages(Array(tok, sw, cv, idf)).fit(docs)
    val vocab = model.stages(2).asInstanceOf[CountVectorizerModel].vocabulary
    val mllibTop = model.transform(docs)
      .select($"doc_id", $"tfidfv").as[(Long, SparseVector)]
      .collect().map { case (id, v) =>
        val best = v.indices.maxBy(i => (v(i), vocab(i)))
        id -> vocab(best)
      }.toMap

    // relational plan (q40 shape) with MLlib's smoothed idf, post-stopword
    val stop = StopWordsRemover.loadDefaultStopWords("english").toSet
    val terms = docs.select($"doc_id", explode(split($"text", "\\s+")).as("term"))
      .filter(!$"term".isin(stop.toSeq: _*))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfc = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val relTop = tf.join(dfc, "term")
      .withColumn("tfidf", $"tf" * log(lit(n + 1.0) / ($"df" + 1.0)))
      .select($"doc_id", $"term", $"tfidf").as[(Long, String, Double)]
      .collect().groupBy(_._1)
      .map { case (id, rows) => id -> rows.maxBy(r => (r._3, r._2))._2 }
    assert(mllibTop === relTop)
    assert(mllibTop.values.toSet ===
      Set("spark", "catalyst", "tungsten", "shuffle"))
  }

  test("NGram stage equals the engine's shingling on shared tokens") {
    val ng = new NGram().setN(3).setInputCol("words").setOutputCol("grams")
    val grams = ng.transform(tok.transform(docs))
      .select($"doc_id", $"grams").as[(Long, Seq[String])]
      .collect().map { case (id, g) => id -> g.distinct.toSet }.toMap
    // NearDup.shingles = distinct word-3-grams over the same whitespace
    // tokens — identical universe to the NGram estimator's output
    val dir = java.nio.file.Files.createTempDirectory("ngramdocs").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val ours = NearDup.shingles(spark, dir)
      .select($"doc_id", $"shingles").as[(Long, Seq[String])]
      .collect().map { case (id, g) => id -> g.toSet }.toMap
    assert(grams === ours)
  }
}
