package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Heuristic language identification (SURVEY §2.K text analysis):
  * score each candidate language by marker-token hits (n-gram/stopword
  * profile), pick the argmax with a deterministic tie-break. Pure
  * codegen'd array expressions — no UDF, no shuffle (narrow map), so it
  * runs at scan speed on 100 TB.
  *
  * On the driver's synthetic corpus the text is language-neutral word
  * salad, so predictions skew to the fallback — the operator contract
  * (deterministic scoring + argmax) is what's exercised.
  */
object LangId {

  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Profile score. Token-based profiles match case-insensitively
    * (sentence-initial "The"/"Der"/"Le" count). zh scores by CHARACTER
    * occurrences in the raw text — Chinese has no whitespace, so a
    * tokenizer-based profile would never fire on real zh input; counting
    * marker characters works for both spaced (synthetic) and unspaced
    * (real) text.
    */
  private def score(lang: String): Column =
    if (lang == "zh")
      profiles(lang).map(m =>
        ((length(col("text")) - length(regexp_replace(col("text"), m, "")))
          / m.length).cast("int"))
        .reduce(_ + _)
    else {
      val set = profiles(lang).map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(t, x -> lcase(x) IN ($set)))")
    }

  /** Per-doc predicted language + per-profile scores; 'und' when no
    * profile matches at all.
    */
  def langId(s: SparkSession, d: String): DataFrame = {
    val scored = documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), "\\s+").as("t"))
      .select((col("doc_id") +: col("lang") +:
        profiles.keys.toSeq.sorted.map(l => score(l).as(s"score_$l"))): _*)
    val langsSorted = profiles.keys.toSeq.sorted
    val best = langsSorted.map(l => struct(col(s"score_$l").as("sc"),
      lit(l).as("lg")))
    scored
      .withColumn("best", greatest(best: _*))
      .withColumn("lang_pred",
        when(col("best.sc") === 0, lit("und")).otherwise(col("best.lg")))
      .select(col("doc_id") +: col("lang") +: col("lang_pred") +:
        langsSorted.map(l => col(s"score_$l")): _*)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_lang_id" -> (langId _))
}
