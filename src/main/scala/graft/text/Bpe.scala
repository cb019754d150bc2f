package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Byte-pair-encoding subword tokenizer — TRAIN and APPLY, the missing
  * tier above q33's fixed BPE-ish regex tokenization: the vocabulary is
  * LEARNED from the corpus (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"), which is how real
  * LLM pipelines size their token budgets.
  *
  * Scale shape (the 100 TB story):
  *  - the corpus-wide work is word-TYPE extraction — one tokenize pass
  *    + one groupBy(word) with map-side combine. Everything after
  *    operates on the type table, whose size is the corpus VOCABULARY,
  *    not the corpus.
  *  - merge learning runs driver-side over the type table pruned to the
  *    `maxTypes` most frequent types (deterministic count-then-word
  *    tie-break) — the standard practice (Sennrich trains on a
  *    frequency table; GPT-2's BPE was fit on a capped type list). The
  *    collect is bounded by maxTypes — a model-build collect like the
  *    IVF codebooks, never corpus-sized. Cost: O(maxTypes · nMerges),
  *    independent of corpus bytes.
  *  - encoding re-distributes: DISTINCT corpus words (vocabulary-sized)
  *    are encoded once each with the broadcast merge ranks, then the
  *    per-word subword counts JOIN back to the corpus — per-doc stats
  *    are one narrow equi-join + aggregate, no per-instance re-encode.
  *
  * Encode semantics (pinned, and what the oracle replays): merges apply
  * in RANK ORDER; each rank rewrites the symbol sequence left-to-right,
  * non-overlapping (the training-time replay definition — each merge
  * transforms the corpus exactly as it did when it was learned).
  * Pair counting during training counts every adjacent position
  * (overlapping), Sennrich's `get_stats` convention.
  */
object Bpe {

  /** Whitespace word instances: (doc_id, w) — the same tokenization as
    * the q21/q22 family, so the oracle's regex split matches. */
  private def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .as("w"))

  /** Left-to-right non-overlapping rewrite of one merge in a symbol
    * sequence (the cascading fold: a freshly merged symbol is the
    * candidate left context for the NEXT position). */
  private[text] def applyMerge(syms: List[String], l: String, r: String)
      : List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    syms.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) {
        out.remove(out.length - 1); out += (l + r)
      } else out += x
    }
    out.toList
  }

  /** Encode one word with ranked merges: rank order, each rank one
    * left-to-right pass. */
  private[text] def encodeWord(w: String, merges: Seq[(String, String)])
      : List[String] = {
    var syms = w.map(_.toString).toList
    merges.foreach { case (l, r) =>
      if (syms.length > 1) syms = applyMerge(syms, l, r)
    }
    syms
  }

  /** Learn `nMerges` merges from the corpus. Returns
    * (rank, left, right) with rank 1-based in learning order. Stops
    * early when the best pair occurs fewer than `minCount` times
    * (weighted by type frequency). Ties break deterministically:
    * highest count, then lexicographically smallest (left, right).
    */
  def bpeTrain(docs: DataFrame, nMerges: Int = 200, maxTypes: Int = 50000,
      minCount: Long = 2L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val typeTable = words(docs).groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxTypes)
      .as[(String, Long)].collect()
    var state: Array[(List[String], Long)] =
      typeTable.map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = Vector.newBuilder[(Int, String, String)]
    var rank = 1
    var continue = true
    while (continue && rank <= nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        var rest = syms
        while (rest.nonEmpty && rest.tail.nonEmpty) {
          val key = (rest.head, rest.tail.head)
          counts.update(key, counts.getOrElse(key, 0L) + c)
          rest = rest.tail
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), best) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (best < minCount) continue = false
        else {
          merges += ((rank, l, r))
          state = state.map { case (syms, c) =>
            (if (syms.length > 1) applyMerge(syms, l, r) else syms, c)
          }
          rank += 1
        }
      }
    }
    merges.result().toDF("rank", "left", "right")
  }

  /** Per-doc subword statistics under a learned merge table: DISTINCT
    * corpus words encode once each (broadcast ranks), the per-word
    * subword count joins back to word instances, and per-doc totals
    * aggregate — (doc_id, n_words, n_bpe_tokens, tokens_per_word_bp).
    */
  def bpeEncode(docs: DataFrame, mergeRows: Seq[(Int, String, String)])
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ranked = mergeRows.sortBy(_._1).map { case (_, l, r) => (l, r) }
    val bc = s.sparkContext.broadcast(ranked)
    val wordRel = words(docs)
    val typeEnc = wordRel.select("w").distinct()
      .as[String]
      .map(w => (w, encodeWord(w, bc.value).length.toLong))
      .toDF("w", "n_sub")
    // the oracle re-runs everything downstream of the per-type encode
    graft.OracleDump.dump(typeEnc, s"$OracleDumpDir/bpe_type_enc.parquet")
    val docIds = docs.select("doc_id")
    docIds.join(
        wordRel.join(typeEnc, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_bpe_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
        // integer basis points: exact in both engines, no float gate
        when(coalesce(col("n_words"), lit(0L)) > 0,
          expr("10000 * n_bpe_tokens DIV n_words")).otherwise(lit(0L))
          .as("tokens_per_word_bp"))
      .orderBy("doc_id")
  }

  private[graft] val OracleDumpDir = "/tmp/graft_bpe_oracle"

  /** Train on the corpus, then report the per-doc encoding statistics —
    * the end-to-end "size my token budget" pass a pipeline runs after
    * fitting a tokenizer. */
  def q82BpeStats(s: SparkSession, d: String, nMerges: Int = 200): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val merges = bpeTrain(docs, nMerges).as[(Int, String, String)].collect()
    bpeEncode(docs, merges.toSeq)
  }

  /** The learned merge table itself — the tokenizer artifact a trainer
    * ships. Deterministic (count-then-lexicographic tie-break), pinned
    * by BpeSpec's hand fixture AND — since round 13 — fully
    * hash-oracled: the dumped merges drive a DuckDB replay (see
    * [[q83Sql]]) that re-derives every greedy argmax independently. */
  def q83BpeMerges(s: SparkSession, d: String, nMerges: Int = 200): DataFrame = {
    val m = bpeTrain(documents(s, d), nMerges).orderBy("rank")
    graft.OracleDump.dump(m, s"$OracleDumpDir/bpe_merges.parquet")
    m
  }

  // The oracle re-runs the whole corpus-application tail over the
  // dumped per-type subword counts: the same whitespace tokenization
  // (the established split-regex parity), the word → n_sub join, the
  // per-doc aggregation, and the integer basis-point ratio. A dropped
  // word, a bad join, or a count drift all hash-mismatch; the per-type
  // fold itself is the dumped engine half (spec-pinned).
  private def q82Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS l
       |  FROM documents
       |), w AS (
       |  SELECT doc_id, unnest(l) AS w FROM toks
       |), enc AS (SELECT * FROM
       |  read_parquet('$OracleDumpDir/bpe_type_enc.parquet/*.parquet')
       |), agg AS (
       |  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(enc.n_sub) AS BIGINT) AS n_bpe_tokens
       |  FROM w JOIN enc USING (w) GROUP BY 1
       |)
       |SELECT t.doc_id,
       |  coalesce(a.n_words, 0) AS n_words,
       |  coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
       |  CASE WHEN coalesce(a.n_words, 0) > 0
       |    THEN (10000 * a.n_bpe_tokens) // a.n_words
       |    ELSE 0 END AS tokens_per_word_bp
       |FROM toks t LEFT JOIN agg a USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  // The q83 oracle REPLAYS the whole training loop in DuckDB and
  // re-derives every merge independently — the strongest form the
  // sequential greedy admits. Mechanics:
  //  - the type table rebuilds from the RAW documents table (the q82
  //    tokenization parity), count-then-word capped at maxTypes;
  //  - each rank-k state applies the DUMPED merge k to state k−1 via
  //    plain string replace() over a boundary-anchored encoding: a
  //    symbol list renders as ␟␟sym₁␟␟sym₂␟␟ (U+001F absent from the
  //    corpus — ASCII-checked; Scala's per-UTF-16-char split and
  //    DuckDB's per-codepoint '(.)' agree on ASCII), and one merge is
  //    replace('␟l␟␟r␟' → '␟lr␟'): the single-␟ anchors force
  //    whole-symbol matches, left-to-right non-overlapping replacement
  //    IS applyMerge (a fresh l+r can never re-match l, r nonempty),
  //    and each match leaves one boundary ␟ on each side so adjacent
  //    occurrences still match — verified against a reference replica;
  //  - the emitted rows are NOT echoed: each rank's (left, right) is
  //    re-derived as the argmax (count desc, then lexicographic) over
  //    the rank-(k−1) state's adjacent-pair counts, with the minCount
  //    gate, so a wrong merge, a bad tie-break, or a count drift
  //    hash-fails at its rank;
  //  - under-emission is caught by a sentinel: the argmax over the
  //    LAST state also emits if it still clears minCount (and the loop
  //    had nMerges headroom) — an extra row the Spark side won't have.
  private def q83Sql: String =
    s"""WITH RECURSIVE
       |m AS (SELECT "rank" AS rank, "left" AS ml, "right" AS mr
       |  FROM read_parquet('$OracleDumpDir/bpe_merges.parquet/*.parquet')),
       |toks AS (
       |  SELECT list_filter(regexp_split_to_array(text, '\\s+'),
       |    x -> x <> '') AS l
       |  FROM documents),
       |types AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(l) AS w FROM toks)
       |  GROUP BY w ORDER BY c DESC, w LIMIT 50000),
       |st AS (
       |  SELECT 0 AS rank, w, c,
       |    chr(31) || chr(31) ||
       |      regexp_replace(w, '(.)', '\\1' || chr(31) || chr(31), 'g') AS s
       |  FROM types
       |  UNION ALL
       |  SELECT st.rank + 1, st.w, st.c,
       |    replace(st.s,
       |      chr(31) || m.ml || chr(31) || chr(31) || m.mr || chr(31),
       |      chr(31) || m.ml || m.mr || chr(31))
       |  FROM st JOIN m ON m.rank = st.rank + 1),
       |syms AS (
       |  SELECT rank, c,
       |    list_filter(string_split(s, chr(31) || chr(31)), x -> x <> '') AS ls
       |  FROM st),
       |cand AS (
       |  SELECT rank, ls[i] AS pl, ls[i + 1] AS pr, c
       |  FROM (SELECT rank + 1 AS rank, c, ls,
       |          unnest(range(1, len(ls))) AS i
       |        FROM syms WHERE len(ls) > 1)),
       |cnts AS (
       |  SELECT rank, pl, pr, CAST(sum(c) AS BIGINT) AS cnt
       |  FROM cand GROUP BY rank, pl, pr),
       |best AS (
       |  SELECT rank, pl, pr, cnt,
       |    row_number() OVER (PARTITION BY rank
       |      ORDER BY cnt DESC, pl, pr) AS rn
       |  FROM cnts),
       |nmax AS (SELECT coalesce(max(rank), 0) AS n FROM m)
       |SELECT CAST(b.rank AS INTEGER) AS "rank",
       |  b.pl AS "left", b.pr AS "right"
       |FROM best b CROSS JOIN nmax
       |WHERE b.rn = 1 AND b.cnt >= 2
       |  AND b.rank <= n + (CASE WHEN n < 200 THEN 1 ELSE 0 END)
       |ORDER BY b.rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_bpe_stats" -> ((s: SparkSession, d: String) => q82BpeStats(s, d)),
    "q83_bpe_merges" -> ((s: SparkSession, d: String) => q83BpeMerges(s, d)))

  val oracle: Map[String, String] = Map(
    "q82_bpe_stats" -> q82Sql,
    "q83_bpe_merges" -> q83Sql)
}
