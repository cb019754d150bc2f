package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Heuristic language identification (SURVEY §2.K text analysis):
  * score each candidate language by marker-token hits (stopword
  * profile) with a character-n-gram fallback for docs too short to
  * contain a stopword, pick the argmax with a deterministic tie-break.
  * Pure codegen'd array/string expressions — no UDF, no shuffle (narrow
  * map), so it runs at scan speed on 100 TB.
  *
  * On the driver's synthetic corpus the text is language-neutral word
  * salad, so predictions skew to the fallback — accuracy on real text
  * is asserted in LangIdSpec on per-language fixtures.
  */
object LangId {

  /** High-frequency stopword profiles (public frequency-list staples).
    * zh profiles by CHARACTER occurrence in the raw text — Chinese has
    * no whitespace, so a tokenizer-based profile would never fire on
    * real zh input; counting marker characters works for both spaced
    * (synthetic) and unspaced (real) text.
    */
  private val tokenProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is", "was", "that",
      "it", "for", "on", "with", "are"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "nicht",
      "mit", "von", "zu", "den", "sind", "auf"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans",
      "que", "pour", "pas", "sur", "avec", "ce"),
    "es" -> Seq("el", "los", "las", "es", "una", "y", "en", "que", "no",
      "por", "con", "para", "del", "se"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不", "人", "有", "这"))

  /** Orthography-characteristic substrings — the short-doc fallback: a
    * three-word fragment rarely contains a stopword, but its spelling
    * still betrays the language (English -ing/-tion, German sch/umlauts,
    * French/Spanish accent repertoires). Character evidence only breaks
    * ties the stopword score leaves (see the combined score below).
    * zh needs no fallback — its marker characters ARE the primary score.
    */
  private val charProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "ing", "tion"),
    "de" -> Seq("sch", "ung", "ich", "ä", "ö", "ü", "ß"),
    "fr" -> Seq("é", "è", "ç", "eau", "oi"),
    "es" -> Seq("ñ", "ó", "í", "ll", "ción"),
    "zh" -> Seq.empty)

  /** Occurrence count of a literal substring (length-delta / |m| —
    * literal `replace`, no regex escaping concerns).
    */
  private def occurrences(src: Column, m: String): Column =
    ((length(src) - length(replace(src, lit(m), lit("")))) / m.length)
      .cast("long")

  /** Combined score: stopword hits dominate (×1000); character-n-gram
    * occurrences decide only when stopword evidence ties (typically
    * short docs where every profile scores 0) — capped at 999 so char
    * evidence can NEVER outweigh a single stopword hit, no matter how
    * long the document. Token-based profiles match case-insensitively
    * (sentence-initial "The"/"Der"/"Le" count). Long arithmetic: an Int
    * tok × 1000 overflows (ANSI mode → job-killing exception) on a doc
    * with > ~2M marker hits — realistic at web-corpus doc sizes.
    */
  private def score(lang: String): Column = {
    val tok: Column =
      if (lang == "zh")
        tokenProfiles(lang).map(m => occurrences(col("text"), m))
          .reduce(_ + _)
      else {
        val set = tokenProfiles(lang).map(w => s"'$w'").mkString(", ")
        expr(s"size(filter(t, x -> lcase(x) IN ($set)))")
      }
    val chars = charProfiles(lang)
    val ch: Column =
      if (chars.isEmpty) lit(0)
      else least(
        chars.map(m => occurrences(lower(col("text")), m)).reduce(_ + _),
        lit(999))
    tok.cast("long") * 1000L + ch
  }

  /** Per-doc predicted language + per-profile scores over an arbitrary
    * (doc_id, lang, text) relation; 'und' when no profile matches.
    */
  def langIdOf(docs: DataFrame): DataFrame = {
    val langsSorted = tokenProfiles.keys.toSeq.sorted
    val scored = docs
      // null text normalizes to '' (r18 review): raw null scores made
      // Spark's greatest-struct tie-break predict 'zh' while the
      // oracle's NULL CASE fell to its ELSE — '' scores 0 everywhere
      // and both sides deterministically emit 'und'
      .select(col("doc_id"), col("lang"),
        coalesce(col("text"), lit("")).as("text"),
        split(coalesce(col("text"), lit("")), "\\s+").as("t"))
      .select((col("doc_id") +: col("lang") +:
        langsSorted.map(l => score(l).as(s"score_$l"))): _*)
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

  def langId(s: SparkSession, d: String): DataFrame =
    langIdOf(documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_lang_id" -> (langId _))

  // ------------------------------------------------------------ oracle
  // The DuckDB oracle is GENERATED from the same tokenProfiles /
  // charProfiles maps the Spark expressions use, so the two sides cannot
  // silently drift. Every building block is deterministic integer/string
  // arithmetic with identical semantics in both engines:
  //  - substring occurrences: length-delta / |m| (exact multiples, so
  //    DuckDB `//` ≡ Spark double-divide + cast-to-long truncation);
  //  - token hits: list_filter(lower(x) IN profile) over a whitespace
  //    split (leading/trailing empty tokens differ between the engines'
  //    split semantics but never match a stopword, so counts agree);
  //  - argmax tie-break: Spark's greatest(struct(score, lang)) prefers
  //    the lexicographically LARGEST lang on score ties → the CASE tests
  //    langs in descending name order.
  private def occSql(src: String, m: String): String =
    s"(length($src) - length(replace($src, '$m', ''))) // ${m.length}"

  private def scoreSql(lang: String): String = {
    val tok =
      if (lang == "zh")
        tokenProfiles(lang).map(m => occSql("text", m)).mkString("(", " + ", ")")
      else {
        val set = tokenProfiles(lang).map(w => s"'$w'").mkString(", ")
        s"len(list_filter(toks, x -> lower(x) IN ($set)))"
      }
    val chars = charProfiles(lang)
    val ch =
      if (chars.isEmpty) "0"
      else "least(" +
        chars.map(m => occSql("lower(text)", m)).mkString(" + ") + ", 999)"
    s"CAST($tok AS BIGINT) * 1000 + ($ch)"
  }

  val oracle: Map[String, String] = {
    val langs = tokenProfiles.keys.toSeq.sorted
    val scoreCols = langs
      .map(l => s"    ${scoreSql(l)} AS score_$l").mkString(",\n")
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val pick = langs.sorted(Ordering[String].reverse).init
      .map(l => s"WHEN score_$l = $best THEN '$l'").mkString("\n    ")
    Map("nq_lang_id" ->
      s"""WITH t AS (
         |  -- coalesce: null text scores 0 -> 'und' (see langIdOf)
         |  SELECT doc_id, lang, coalesce(text, '') AS text,
         |    regexp_split_to_array(coalesce(text, ''), '\\s+') AS toks
         |  FROM documents
         |), sc AS (
         |  SELECT doc_id, lang,
         |$scoreCols
         |  FROM t)
         |SELECT doc_id, lang,
         |  CASE WHEN $best = 0 THEN 'und'
         |    $pick
         |    ELSE '${langs.min}' END AS lang_pred,
         |  ${langs.map(l => s"score_$l").mkString(", ")}
         |FROM sc ORDER BY doc_id""".stripMargin)
  }
}
