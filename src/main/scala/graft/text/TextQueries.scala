package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis + deduplication operators over the `documents` table
  * (SURVEY.md §2.K: the LLM-data-pipeline extension surface).
  *
  * Scale notes:
  *  - Tokenization / shingling / fingerprints are per-row expressions —
  *    narrow, codegen'd, embarrassingly parallel.
  *  - Exact dedup is a hash aggregate on a fingerprint, NOT on the raw
  *    text: at 100 TB you shuffle 16-byte md5 keys, not document bodies.
  *  - Near-dup jaccard uses an inverted shingle index (explode + equi-join
  *    on the shingle) — the classic scale-out plan; the quadratic
  *    all-pairs form never appears. Hot shingles are the skew risk: the
  *    DF-style mitigation is filtering ultra-frequent shingles (stop-
  *    shingles) before the self-join, which we do with a frequency cap.
  */
object TextQueries {

  /** tokens column (array<string>) from the raw text. */
  private val toks = split(col("text"), "\\s+")

  // ---------------------------------------------------------------- q21
  // Corpus profile per language: row counts + length stats.
  def q21LangStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        round(avg("n_chars"), 4).as("avg_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
      .orderBy("lang")

  val q21Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  round(avg(n_chars), 4) AS avg_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q22
  // Token counting (whitespace tokenizer) aggregated per source.
  def q22TokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), size(toks).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        max("n_tokens").as("max_tokens"))
      .orderBy("lang")

  val q22Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS sum_tokens,
      |  round(avg(n), 4) AS avg_tokens,
      |  CAST(max(n) AS BIGINT) AS max_tokens
      |FROM (SELECT lang,
      |        len(regexp_split_to_array(text, '\s+')) AS n
      |      FROM documents) t
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q23
  // Exact deduplication by content fingerprint: md5(text) is the shuffle
  // key; keeper = min doc_id per group (deterministic, unlike
  // dropDuplicates' arbitrary-row semantics). [SURVEY §2.K exact dedup,
  // reference op C2]
  def q23DedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(md5(col("text")).as("fingerprint"), col("doc_id"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("fingerprint")

  val q23Sql: String =
    """SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY fingerprint""".stripMargin

  // ---------------------------------------------------------------- q24
  // Per-document quality scoring: token counts, lexical diversity,
  // stopword ratio, mean token length — the standard pre-training
  // quality filters, all as codegen'd array expressions.
  def q24QualityScore(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("n_chars"), toks.as("t"))
      .select(
        col("doc_id"), col("n_chars"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"),
        (size(array_distinct(col("t"))).cast("double") /
          size(col("t")).cast("double")).as("distinct_ratio"),
        (expr("size(filter(t, x -> x IN ('the', 'a')))").cast("double") /
          size(col("t")).cast("double")).as("stopword_ratio"),
        (expr("aggregate(transform(t, x -> length(x)), 0, (acc, x) -> acc + x)")
          .cast("double") / size(col("t")).cast("double"))
          .as("avg_token_len"))
      .orderBy("doc_id")

  val q24Sql: String =
    """SELECT doc_id, n_chars,
      |  CAST(len(t) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
      |  CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS DOUBLE) / len(t)
      |    AS stopword_ratio,
      |  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
      |    AS avg_token_len
      |FROM (SELECT doc_id, n_chars,
      |        regexp_split_to_array(text, '\s+') AS t
      |      FROM documents) d
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q25
  // Near-duplicate detection via word-3-gram shingle Jaccard, computed
  // with an inverted shingle index: explode distinct shingles, equi-join
  // doc lists on the shingle (shuffle key = shingle), count intersections
  // per pair, then jaccard = |∩| / (|A| + |B| − |∩|). Pairs ≥ 0.1 emitted.
  // This is the exact-counting backstop; MinHashLSH (nq_minhash_neardup)
  // is the sub-quadratic approximation of the same join.
  //
  // Skew guard: a shingle appearing in k docs yields k²/2 candidate rows,
  // so one viral stop-shingle quadratically blows up the self-join. Docs'
  // shingle sets are therefore capped to shingles with document frequency
  // ≤ maxDf BEFORE the join (and before the size aggregate, so jaccard is
  // consistent over the capped universe). The hot-shingle list is by
  // construction tiny (≤ |corpus|/maxDf entries) → AQE broadcasts the
  // anti-join. At the test SFs max df = 25, so maxDf=100 filters nothing
  // and the oracle is unaffected; the cap's effect is pinned by
  // TextSkewSpec on a fixture with an injected hot shingle.
  def q25NeardupJaccard(s: SparkSession, d: String, maxDf: Int = 100): DataFrame = {
    // shingling shares NearDup.shingles (typed map — see its scaladoc for
    // why the transform+explode expression route is pathologically slow);
    // cached: the plan references this relation 4× (both join sides +
    // the size aggregate) and would otherwise re-shingle the corpus 4×
    // cached: referenced by the hot-shingle aggregate AND the anti-join
    // left side — shingling (the typed-map tokenize pass) runs once.
    // Shingles are hashed to LONGs in the same pass: every downstream
    // shuffle/join/aggregate keys on 8-byte ints instead of ~25-byte
    // strings (hash collisions across 2⁶⁴ are negligible, and the
    // jaccard only counts matches, so the result is unchanged).
    // groupBy (not a count window) for the df: partial aggregation
    // map-side combines the hot key, so the skewed shingle never lands
    // on one reducer.
    val raw = NearDup.hashedShinglesOf(graft.Tables.documents(s, d))
      .withColumnRenamed("h", "tri").cache()
    val hot = raw.groupBy("tri").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("tri")
    // tri deliberately NOT cached (r19 A/B): its three consumers (size
    // aggregate + both join sides) re-run only a broadcast anti-join
    // over the CACHED raw rows — cheap — while a second cache added a
    // materialization barrier (measured ~2.55 s with vs ~2.44 s without,
    // flat calibrator; the Zipf/Seasonal finding at smaller scale).
    val tri = raw.join(hot, Seq("tri"), "left_anti")
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // SHUFFLE_HASH (guide §3.1): without the hint AQE broadcasts one
    // whole tri side (corpus-sized: 260k rows ≈ 15 MB at sf0.1) — a
    // serial driver collect+serialize per run, and an impossibility at
    // cluster scale where tri is the corpus. The shuffled-hash join
    // partitions both sides by the shingle key (per-partition build =
    // tri/shuffle.partitions rows, df-capped by maxDf so no hot-key
    // partition) — A/B r20: join+count 1.0-1.5 s hinted vs 1.3-2.1 s
    // broadcast, same-session pairs.
    val a = tri.as("a").hint("SHUFFLE_HASH")
    val b = tri.as("b").hint("SHUFFLE_HASH")
    val inter = a.join(b,
        col("a.tri") === col("b.tri") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_inter"))
    // plain equi-joins on doc_id (NOT broadcast(sizes)): the per-doc size
    // relation grows with the corpus — a broadcast would pin every doc id
    // in driver/executor memory at 100 TB. AQE broadcasts when small.
    inter
      .join(sizes.as("sa"), col("d1") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("d2") === col("sb.doc_id"))
      .select(col("d1"), col("d2"),
        (col("n_inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.1)
      .orderBy("d1", "d2")
  }

  // list_filter strips empty tokens — the Spark side's shingleArray does
  // the same, and "no empty tokens" is the only tokenization the two
  // engines' split semantics agree on (DuckDB keeps leading AND trailing
  // empties, Java split only the leading one)
  val q25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |  FROM documents
      |), tri0 AS (
      |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tri
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 2)) AS i) g
      |), hot AS (
      |  SELECT tri FROM tri0 GROUP BY tri HAVING count(*) > 100
      |), tri AS (
      |  SELECT * FROM tri0 WHERE tri NOT IN (SELECT tri FROM hot)
      |), sizes AS (
      |  SELECT doc_id, count(*) AS sz FROM tri GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_inter
      |  FROM tri a JOIN tri b ON a.tri = b.tri AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT d1, d2,
      |  CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) AS jaccard
      |FROM inter
      |JOIN sizes sa ON d1 = sa.doc_id
      |JOIN sizes sb ON d2 = sb.doc_id
      |WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.1
      |ORDER BY d1, d2""".stripMargin

  // ---------------------------------------------------------------- q33
  // BPE-style regex tokenization (word / number / punctuation classes)
  // — the second tokenizer next to whitespace q22; regexp_extract_all is
  // codegen'd and identical in DuckDB.
  def q33RegexTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
          .as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        round(avg("n_tokens"), 4).as("avg_tokens"))
      .orderBy("lang")

  val q33Sql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS sum_tokens,
      |  round(avg(n), 4) AS avg_tokens
      |FROM (SELECT lang,
      |        len(regexp_extract_all(lower(text),
      |            '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n
      |      FROM documents) t
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q34
  // Literal dropDuplicates (reference op C2): distinct (lang, source)
  // combinations — all projected columns are the dedup key, so the
  // arbitrary-row-pick semantics of dropDuplicates are deterministic.
  def q34DropdupPairs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select("lang", "source")
      .dropDuplicates()
      .orderBy("lang", "source")

  val q34Sql: String =
    """SELECT DISTINCT lang, source FROM documents
      |ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------- q40
  // TF-IDF scoring, fully relational (the exact form of HashingTF+IDF):
  // tf from an explode+groupBy, df from a per-term aggregate, idf =
  // ln(N / df), top-3 terms per doc. The same two-aggregate shape
  // MLlib's IDF estimator distributes.
  // The tf⋈df join is a plain equi-join on the term, NOT broadcast(df):
  // the document-frequency relation IS the vocabulary and grows with the
  // corpus (billions of terms on web-scale text) — a forced broadcast
  // pins it in every executor. AQE demotes the shuffle to a broadcast
  // whenever df is actually small, so the hint buys nothing even on tiny
  // corpora. Only nDocs (one row) is safe to broadcast unconditionally.
  def q40Tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, d)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  val q40Sql: String =
    """WITH terms AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
      |), df AS (
      |  SELECT term, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1
      |), n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, term, tf,
      |    tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, term, tf, tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY tfidf DESC, term) AS rn
      |  FROM scored)
      |SELECT doc_id, term, tf, round(tfidf, 6) AS tfidf, rn
      |FROM ranked WHERE rn <= 3
      |ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q48
  // Edit-distance text similarity: Levenshtein over consecutive-doc
  // prefixes (codegen'd dynamic-programming expression in both engines).
  def q48Levenshtein(s: SparkSession, d: String): DataFrame = {
    val a = documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id").as("d1"),
        substring(col("text"), 1, 40).as("t1"))
    val b = documents(s, d)
      .select((col("doc_id") - 1).as("d1"),
        substring(col("text"), 1, 40).as("t2"))
    a.join(b, "d1")
      .select(col("d1"),
        levenshtein(col("t1"), col("t2")).cast("long").as("edit_dist"))
      .orderBy("d1")
  }

  val q48Sql: String =
    """SELECT a.doc_id AS d1,
      |  levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS edit_dist
      |FROM documents a
      |JOIN documents b ON b.doc_id = a.doc_id + 1
      |WHERE a.doc_id < 100
      |ORDER BY d1""".stripMargin

  // ---------------------------------------------------------------- q53
  // Document fingerprinting by Karp–Rabin rolling hash: polynomial hash
  // of every w=8-char window mod a prime, fingerprint = min over windows
  // (the winnowing primitive — robust to edits outside the minimizing
  // window, unlike whole-text md5). Arithmetic stays < 2³¹ (acc < P,
  // acc·31+127 ≪ 2³¹) so the identical integer recurrence runs in both
  // engines with no overflow under ANSI mode. Per-row scalar expression:
  // narrow, codegen'd, embarrassingly parallel — no shuffle at any
  // scale. (The O(len) true-rolling update — subtract the outgoing
  // char's B^(w-1) term — needs a stateful scan; the O(len·w) windowed
  // form keeps it a pure expression and w is a constant 8.)
  def q53Fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("n_chars") >= 8)
      .select(col("doc_id"),
        expr("""array_min(transform(sequence(1, length(text) - 7), i ->
                 aggregate(sequence(i, i + 7), 0L,
                   (acc, j) -> (acc * 31 + ascii(substring(text, j, 1))) % 1000003)))""")
          .as("fingerprint"),
        (length(col("text")) - 7).cast("long").as("n_windows"))
      .orderBy("doc_id")

  val q53Sql: String =
    """SELECT doc_id,
      |  list_min(list_transform(generate_series(1, length(text) - 7), i ->
      |    list_reduce(
      |      list_prepend(0, list_transform(generate_series(i, i + 7),
      |                        j -> ascii(substr(text, j, 1)))),
      |      (acc, c) -> (acc * 31 + c) % 1000003)))::BIGINT AS fingerprint,
      |  CAST(length(text) - 7 AS BIGINT) AS n_windows
      |FROM documents
      |WHERE n_chars >= 8
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q55
  // Ordered string aggregation (listagg/string_agg): doc ids per
  // language as a deterministic comma list. collect_list carries no
  // ordering guarantee under parallel merge, so the sort happens inside
  // the row (array_sort) — the scale-correct formulation; an unsorted
  // listagg would be nondeterministic across partitionings.
  def q55StringAgg(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") < 100)
      .groupBy("lang")
      .agg(concat_ws(",",
        expr("transform(array_sort(collect_list(doc_id)), x -> CAST(x AS STRING))"))
        .as("ids"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  val q55Sql: String =
    """SELECT lang, string_agg(doc_id, ',' ORDER BY doc_id) AS ids,
      |  count(*) AS n_docs
      |FROM documents
      |WHERE doc_id < 100
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q56
  // Sequence packing — the tokenize-and-pack step of a training-data
  // pipeline: documents are laid head-to-tail per language in doc_id
  // order and split into fixed-size token windows; each doc gets the
  // pack it starts in and its offset there. Pure window arithmetic:
  // running cumsum partitioned by lang (parallel across languages —
  // a GLOBAL pack order would serialize the window; q58 below is the
  // 100 TB form, packing within (lang, shard) partitions).
  def q56PackSequences(s: SparkSession, d: String,
      seqLen: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum("n_tokens").over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        (col("start_tok") / seqLen).cast("long").as("pack_id"),
        (col("start_tok") % seqLen).as("pack_offset"))
      .orderBy("doc_id")
  }

  val q56Sql: String =
    """SELECT doc_id, lang, n_tokens,
      |  CAST(floor(start_tok / 2048) AS BIGINT) AS pack_id,
      |  CAST(start_tok % 2048 AS BIGINT) AS pack_offset
      |FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
      |      - n_tokens AS start_tok
      |  FROM (SELECT doc_id, lang,
      |          len(regexp_split_to_array(text, '\s+')) AS n_tokens
      |        FROM documents) t) p
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q58
  // Shard-parallel sequence packing — the 100 TB form of q56: a single
  // per-lang window funnels each language's whole corpus through ONE
  // task's sort, so the scale path partitions the window by
  // (lang, shard) and numbers packs (lang, shard, pack_id) — window
  // parallelism grows with nShards × |langs| instead of |langs|.
  // shard = doc_id % nShards (not a hash) so the oracle runs the
  // identical expression in DuckDB — Spark's % like DuckDB's keeps the
  // dividend's sign (pmod would diverge on negative ids); any
  // deterministic doc→shard map works — trainers read packs per
  // (shard, pack_id) either way.
  def q58PackSharded(s: SparkSession, d: String, seqLen: Int = 2048,
      nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % lit(nShards.toLong)).as("shard"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum("n_tokens").over(w) - col("n_tokens"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        (col("start_tok") / seqLen).cast("long").as("pack_id"),
        (col("start_tok") % seqLen).as("pack_offset"))
      .orderBy("doc_id")
  }

  val q58Sql: String =
    """SELECT doc_id, lang, doc_id % 8 AS shard, n_tokens,
      |  CAST(floor(start_tok / 2048) AS BIGINT) AS pack_id,
      |  CAST(start_tok % 2048 AS BIGINT) AS pack_offset
      |FROM (
      |  SELECT doc_id, lang, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang, doc_id % 8 ORDER BY doc_id)
      |      - n_tokens AS start_tok
      |  FROM (SELECT doc_id, lang,
      |          len(regexp_split_to_array(text, '\s+')) AS n_tokens
      |        FROM documents) t) p
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q57
  // Overlapping chunking — the retrieval-side sibling of q56's packing:
  // each document splits into 64-token windows with stride 48 (16-token
  // overlap), one row per chunk. Narrow per-row expression (generate
  // chunk starts, slice the token array) — embarrassingly parallel, no
  // shuffle; the natural feed for embedding/indexing stages.
  def q57ChunkDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .select(col("doc_id"),
        posexplode(expr("sequence(1, size(t), 48)")).as(Seq("chunk_id", "start")),
        col("t"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(expr("slice(t, start, 64)")).cast("long").as("n_tokens"),
        array_join(expr("slice(t, start, 64)"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  val q57Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS l FROM documents
      |), c AS (
      |  SELECT doc_id, CAST(floor((i - 1) / 48) AS BIGINT) AS chunk_id,
      |    list_slice(l, i, i + 63) AS ch
      |  FROM toks, LATERAL (
      |    SELECT unnest(generate_series(1, len(l), 48)) AS i) g)
      |SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
      |  array_to_string(ch, ' ') AS chunk_text
      |FROM c
      |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------------------------------------------------------- q59
  // Vocabulary building — the tokenizer-training precursor (BPE seed
  // vocab, stopword mining, df-threshold pruning): per-term collection
  // frequency (tf) and document frequency (df), df-thresholded, top-k
  // by tf. Scale shape: ONE shuffle keyed on term (countDistinct
  // expands to the standard two-phase distinct aggregate; tf partials
  // are map-side); the vocabulary is corpus-derived and grows with the
  // corpus, so nothing here is broadcast — same discipline as q40's
  // df join. The final top-k is a TakeOrdered over the k threshold
  // survivors, not a global sort of the vocabulary.
  def q59VocabTopk(s: SparkSession, d: String, minDf: Int = 2,
      k: Int = 50): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("tf"))
      .filter(col("df") >= minDf)
      .orderBy(col("tf").desc, col("term"))
      .limit(k)

  val q59Sql: String =
    """SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
      |FROM (SELECT doc_id,
      |        unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      |      FROM documents)
      |WHERE length(term) > 0
      |GROUP BY term
      |HAVING count(DISTINCT doc_id) >= 2
      |ORDER BY tf DESC, term LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q62
  // Repetition scoring — the C4/Gopher-family quality signal: per doc,
  // total 3-gram occurrences, the most-repeated 3-gram's count, and
  // their ratio (a high ratio marks boilerplate/spam with looping
  // text). NON-distinct grams, unlike the dedup shingles — repetition
  // is exactly what dedup's .distinct throws away. Shape: one typed
  // tokenize pass, then two hash aggregates keyed (doc_id, gram) then
  // doc_id — the (doc_id, gram) key is unique-per-doc-gram so the first
  // aggregate map-side-combines the repeats; nothing is broadcast and
  // docs too short to score carry null (unknown, not clean).
  /** Per-doc repetition scores over any (doc_id, text) relation —
    * (doc_id, n_grams, top_gram, rep_ratio); docs too short to score
    * are ABSENT (q62 left-joins them back as null; Curation treats
    * absent as un-gateable). Shared with the curation repetition gate.
    */
  /** Per-doc (n_grams, top_gram) computed ROW-LOCALLY: the 3-gram
    * multiset lives entirely inside one document (one row), so both
    * "aggregates" are a per-row HashMap over that doc's grams — bounded
    * by the doc's token count, never corpus-scale. None for docs too
    * short to score (< 3 tokens) and for null text (a crawl corpus WILL
    * carry nulls; the old explode path would have NPE'd — same guard
    * as Curation's quality UDF).
    *
    * r19 optimization (guide §2.4): the previous form exploded one
    * (doc_id, gram-string) row per corpus token and ran TWO shuffled
    * aggregates keyed (doc_id, gram) then doc_id — every key carrying
    * the ~25-byte gram string across the exchange — to compute numbers
    * that never leave the document. Plan went 3 Exchanges → 1 (the
    * final orderBy); output bit-identical (integer counts either way).
    */
  @inline private def repCounts(text: String): Option[(Long, Long)] = {
    // drop empty tokens EXPLICITLY: Java split keeps a leading empty
    // on leading whitespace, DuckDB's regexp_split_to_array keeps
    // trailing empties too — filtering both sides is the only
    // tokenization the two engines agree on (q59 does the same)
    val t = if (text == null) Array.empty[String]
      else text.split("\\s+").filter(_.nonEmpty)
    if (t.length < 3) None
    else {
      val counts = new java.util.HashMap[String, java.lang.Long](t.length * 2)
      var top = 0L; var i = 0
      while (i <= t.length - 3) {
        val g = t(i) + " " + t(i + 1) + " " + t(i + 2)
        val c: Long = counts.getOrDefault(g, 0L) + 1L
        counts.put(g, c)
        if (c > top) top = c
        i += 1
      }
      Some(((t.length - 2).toLong, top))
    }
  }

  private[graft] def repetitionOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // the UNROUNDED ratio rides along for gating callers (Curation's
    // maxRepRatio): the rounded value is presentation only, and a gate
    // on it would misclassify ratios within 5e-5 of the threshold
    docs.select("doc_id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        repCounts(text).iterator.map { case (n, top) => (id, n, top) }
      }.toDF("doc_id", "n_grams", "top_gram")
      .select(col("doc_id"), col("n_grams"), col("top_gram"),
        (col("top_gram").cast("double") /
          col("n_grams").cast("double")).as("rep_ratio_raw"),
        round(col("top_gram").cast("double") /
          col("n_grams").cast("double"), 4).as("rep_ratio"))
  }

  def q62Repetition(s: SparkSession, d: String): DataFrame = {
    // one pass, zero joins: short/null-text docs emit null scores inline
    // (the old left-join-back of absent docs, without the join — its
    // only purpose was re-attaching them)
    val sess = s
    import sess.implicits._
    documents(s, d).select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        repCounts(text) match {
          case Some((n, top)) => (id, Some(n), Some(top))
          case None => (id, None, None)
        }
      }.toDF("doc_id", "n_grams", "top_gram")
      .select(col("doc_id"), col("n_grams"), col("top_gram"),
        round(col("top_gram").cast("double") /
          col("n_grams").cast("double"), 4).as("rep_ratio"))
      .orderBy("doc_id")
  }

  val q62Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'),
      |                x -> length(x) > 0) AS l
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS gram
      |  FROM toks, LATERAL (
      |    SELECT unnest(generate_series(1, len(l) - 2)) AS i) s
      |  WHERE len(l) >= 3),
      |c AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
      |        max(c) AS top_gram
      |      FROM c GROUP BY 1)
      |SELECT d.doc_id, p.n_grams, p.top_gram,
      |  round(CAST(top_gram AS DOUBLE) / n_grams, 4) AS rep_ratio
      |FROM (SELECT doc_id FROM documents) d
      |LEFT JOIN p USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q70
  // Heavy hitters over the corpus token stream: every term whose
  // frequency strictly exceeds `support` of the total token count, with
  // exact counts. q59 answers "top-k by document frequency" with a
  // full-vocabulary shuffle; this is the other classic vocabulary
  // question — "everything above a frequency floor" — with the sketch
  // shape that question deserves at 100 TB:
  //   pass 1: Spark's single-pass Karp–Shenker–Papadimitriou candidate
  //     sketch (`stat.freqItems`) — per-partition counter maps bounded
  //     at 1/support entries, merged driver-side, NO shuffle; a
  //     guaranteed SUPERSET of every term above support (false
  //     positives possible, false negatives impossible — Karp et al.
  //     2003, "A simple algorithm for finding frequent elements").
  //   pass 2: ONE exact aggregate whose key is the term for candidates
  //     and NULL for everything else — ≤ 1/support + 1 groups, map-side
  //     combined, so the shuffle carries a few hundred rows where q59's
  //     carries the whole vocabulary. The corpus token total rides out
  //     of the same aggregate (NULL group + candidate counts sum to
  //     it) — no third scan.
  // The exact verify makes the output layout-independent even though
  // the sketch's false-positive set isn't, and SQL-expressible → the
  // oracle re-proves the prefilter is semantics-preserving every round
  // (same pattern as the Bloom decontamination form).
  /** Shared tokenizer of the heavy-hitter family — the batch operator
    * and `StreamingOps.heavyHittersStream`'s MG summary must tokenize
    * identically or the streaming summary and the batch exact-verify
    * silently diverge. */
  private[graft] def tokenTerms(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)

  /** q70's pass 2, shared with the streaming MG store's read path
    * (`StreamingOps.heavyHittersFromStore`): ONE exact aggregate keyed
    * candidate-or-NULL over an already-tokenized corpus. Correct for
    * ANY candidate superset of the true heavy hitters — the caller
    * owns that guarantee (freqItems sketch here, the MG bound there).
    */
  private[graft] def exactVerify(toks: DataFrame, candidates: Seq[String],
      support: Double): DataFrame = {
    val keyed = // candidate terms keep their identity; the rest pool under NULL
      if (candidates.isEmpty) lit(null).cast("string")
      else when(col("term").isin(candidates: _*), col("term"))
    val grouped = toks.groupBy(keyed.as("term")).agg(count(lit(1)).as("tf"))
    // corpus total as a broadcast 1-row frame, NOT a window: a
    // no-partition window plans as a single-partition WindowExec (WARN +
    // one reducer); the two aggregate branches instead share the term
    // Exchange (ReuseExchange — one corpus scan), and the join adds no
    // shuffle because the total is broadcast
    val total = grouped.agg(sum("tf").as("n_tokens"))
    grouped.crossJoin(broadcast(total))
      .filter(col("term").isNotNull &&
        col("tf").cast("double") > col("n_tokens").cast("double") * lit(support))
      .select(col("term"), col("tf"), col("n_tokens"))
      .orderBy("term")
  }

  /** Core operator over any relation with a `text` column. */
  def heavyHitters(docs: DataFrame, support: Double = 0.002): DataFrame = {
    val toks = tokenTerms(docs)
    val candidates: Seq[String] =
      toks.stat.freqItems(Seq("term"), support).head.getSeq[String](0)
    exactVerify(toks, candidates, support)
  }

  def q70HeavyHitters(s: SparkSession, d: String,
      support: Double = 0.002): DataFrame =
    heavyHitters(documents(s, d), support)

  val q70Sql: String =
    """WITH toks AS (
      |  SELECT t.term
      |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      |        FROM documents) t
      |  WHERE length(t.term) > 0),
      |tot AS (SELECT count(*) AS n FROM toks)
      |SELECT term, count(*) AS tf, (SELECT n FROM tot) AS n_tokens
      |FROM toks
      |GROUP BY term
      |HAVING CAST(count(*) AS DOUBLE) > CAST((SELECT n FROM tot) AS DOUBLE) * 0.002
      |ORDER BY term""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_heavy_hitters" -> ((s: SparkSession, d: String) => q70HeavyHitters(s, d)),
    "q62_repetition" -> q62Repetition _,
    "q59_vocab_topk" -> ((s: SparkSession, d: String) => q59VocabTopk(s, d)),
    "q58_pack_sharded" -> ((s: SparkSession, d: String) => q58PackSharded(s, d)),
    "q57_chunk_docs" -> q57ChunkDocs _,
    "q56_pack_sequences" -> ((s: SparkSession, d: String) => q56PackSequences(s, d)),
    "q55_string_agg" -> q55StringAgg _,
    "q53_fingerprint" -> q53Fingerprint _,
    "q48_levenshtein" -> q48Levenshtein _,
    "q40_tfidf" -> q40Tfidf _,
    "q33_regex_tokens" -> q33RegexTokens _,
    "q34_dropdup_pairs" -> q34DropdupPairs _,
    "q21_lang_stats" -> q21LangStats _,
    "q22_token_stats" -> q22TokenStats _,
    "q23_dedup_exact" -> q23DedupExact _,
    "q24_quality_score" -> q24QualityScore _,
    "q25_neardup_jaccard" -> ((s: SparkSession, d: String) => q25NeardupJaccard(s, d)))

  val oracle: Map[String, String] = Map(
    "q70_heavy_hitters" -> q70Sql,
    "q62_repetition" -> q62Sql,
    "q59_vocab_topk" -> q59Sql,
    "q58_pack_sharded" -> q58Sql,
    "q57_chunk_docs" -> q57Sql,
    "q56_pack_sequences" -> q56Sql,
    "q55_string_agg" -> q55Sql,
    "q53_fingerprint" -> q53Sql,
    "q48_levenshtein" -> q48Sql,
    "q40_tfidf" -> q40Sql,
    "q33_regex_tokens" -> q33Sql,
    "q34_dropdup_pairs" -> q34Sql,
    "q21_lang_stats" -> q21Sql,
    "q22_token_stats" -> q22Sql,
    "q23_dedup_exact" -> q23Sql,
    "q24_quality_score" -> q24Sql,
    "q25_neardup_jaccard" -> q25Sql)
}
