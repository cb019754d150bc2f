package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Corpus scrubbing operators — the cleaning passes an LLM training
  * pipeline runs between curation and packing:
  *
  *  - q67 PII redaction: regex scrub of emails / phone numbers / IPv4
  *    addresses, with per-category match counts for audit. A narrow
  *    per-row transform — regexp_* are codegen'd, nothing shuffles;
  *    at 100 TB this runs at scan speed.
  *  - q68 chunk-level exact dedup (the CCNet paragraph-dedup shape at
  *    fixed-chunk granularity): drop every repeated text chunk except
  *    its first occurrence corpus-wide, then reassemble documents from
  *    their surviving chunks.
  *
  * The test corpus carries no natural PII, so q67 PLANTS deterministic
  * PII derived from doc_id (one email, one phone, one IP per doc)
  * before scrubbing — the construction is part of the query and is
  * replicated verbatim in the DuckDB oracle, so the redaction regexes
  * are what's actually under test.
  */
object Scrub {

  // shared RE2-and-Java-compatible regex literals (single-escaped here,
  // doubled into Scala strings below where needed)
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+1-\\d{3}-555-\\d{4}"
  // real 0-255 octets only, fenced by \b so version strings ("v1.2.3.4")
  // and longer digit runs never partially match. \b, not lookarounds:
  // DuckDB's RE2 has no lookbehind/lookahead, while ASCII \b means the
  // same thing to both engines (and is strictly safer — an IP glued to
  // a word char is left alone rather than half-redacted).
  private val ipOctet = "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)"
  private val ipRe = s"\\b$ipOctet(\\.$ipOctet){3}\\b"

  // ---------------------------------------------------------------- q67
  /** PII redaction with audit counts. Counts are taken on the raw text
    * BEFORE replacement (regexp_extract_all group 0); replacement order
    * is email → phone → IP, which is safe because no later pattern can
    * match inside an earlier placeholder. */
  def q67PiiRedact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or "),
          format_string("+1-%03d-555-%04d",
            pmod(col("doc_id"), lit(1000L)), pmod(col("doc_id"), lit(10000L))),
          lit(" from 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".0.1")).as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0)))
          .cast("long").as("n_phone"),
        size(regexp_extract_all(col("raw"), lit(ipRe), lit(0)))
          .cast("long").as("n_ip"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("raw"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          ipRe, "<IP>").as("clean"))
      .orderBy("doc_id")

  // DuckDB's regexp_replace is first-match-only by default — the 'g'
  // option makes it global like Spark's. Both engines run RE2-style
  // patterns here (no backrefs/lookarounds), so the literals are shared.
  val q67Sql: String =
    s"""WITH raw AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com or ' ||
       |    printf('+1-%03d-555-%04d', doc_id % 1000, doc_id % 10000) ||
       |    ' from 10.' || (doc_id % 256) || '.0.1' AS raw
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(raw, '$emailRe')) AS n_email,
       |  len(regexp_extract_all(raw, '$phoneRe')) AS n_phone,
       |  len(regexp_extract_all(raw, '$ipRe')) AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(raw,
       |    '$emailRe', '<EMAIL>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g'),
       |    '$ipRe', '<IP>', 'g') AS clean
       |FROM raw ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Chunk-level exact dedup, CCNet-style: documents are cut into
    * non-overlapping `w`-token chunks (the corpus has no line
    * structure, so fixed windows stand in for paragraphs); every chunk
    * that repeats ANYWHERE in the corpus is dropped except its first
    * occurrence in (doc_id, chunk_id) order, and each document is
    * reassembled from its surviving chunks.
    *
    * Scale shape: the dedup key is md5(chunk) — 16-byte shuffle keys
    * instead of kilobyte strings (two identical hashes from different
    * chunks would need an md5 collision; the oracle groups on the raw
    * string, so a collision would fail the driver check loudly). Two
    * column-pruned corpus scans and two keyed shuffles, both
    * skew-proof:
    * min(struct(doc_id, chunk_id, chunk)) per chunk hash picks the
    * first occurrence WITH map-side partial aggregation — a
    * boilerplate chunk repeated millions of times collapses to one row
    * per map partition before the exchange, where the earlier
    * row_number-window form funneled every copy into a single
    * un-splittable window task (no partial agg, no AQE skew-split) —
    * then one per-doc aggregate over the WINNERS ONLY (distinct
    * chunks, not all chunks) rebuilds counts and surviving text, its
    * collect_list bounded by a single document's length. n_chunks
    * never touches the hash shuffle at all: it's ceil(tokens/w),
    * computed narrowly on the doc side of the final co-keyed doc_id
    * join — the second (text-only) scan is the price of keeping every
    * non-winning chunk row out of the doc_id shuffle; no broadcast,
    * nothing corpus-sized in one task.
    */
  def q68ChunkDedup(s: SparkSession, d: String, w: Int = 16): DataFrame = {
    val docs = documents(s, d)
    val toksCol = filter(split(col("text"), "\\s+"), t => length(t) > 0)
    val chunks = docs
      .select(col("doc_id"), toksCol.as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        posexplode(expr(s"sequence(1, size(t), $w)"))
          .as(Seq("chunk_id", "start")),
        col("t"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(expr(s"slice(t, start, $w)"), " ").as("chunk"))
    // (doc_id, chunk_id) is unique per row, so the struct min is decided
    // before the chunk text ever compares
    val winners = chunks
      .groupBy(md5(col("chunk")).as("h"))
      .agg(min(struct(col("doc_id"), col("chunk_id"), col("chunk"))).as("win"))
      .select(col("win.doc_id").as("doc_id"),
        col("win.chunk_id").as("chunk_id"), col("win.chunk").as("chunk"))
    val perDoc = winners.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        collect_list(struct(col("chunk_id"), col("chunk"))).as("lst"))
      .select(col("doc_id"), col("n_kept"),
        array_join(
          transform(array_sort(col("lst")), x => x.getField("chunk")),
          " ").as("kept_text"))
    docs
      .select(col("doc_id"), toksCol.as("t"))
      .select(col("doc_id"),
        // sequence(1, 0) is an illegal range — the `when` guards it
        when(size(col("t")) > 0, expr(s"size(sequence(1, size(t), $w))"))
          .otherwise(lit(0)).cast("long").as("n_chunks"))
      // all-dropped docs never appear in `winners` → null kept_text
      // (matching the oracle's string_agg over an empty group), never ""
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("kept_text"))
      .orderBy("doc_id")
  }

  val q68Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |  FROM documents
      |), ch AS (
      |  SELECT doc_id, CAST(floor((i - 1) / 16) AS BIGINT) AS chunk_id,
      |    array_to_string(list_slice(l, i, i + 15), ' ') AS chunk
      |  FROM toks, LATERAL (
      |    SELECT unnest(generate_series(1, len(l), 16)) AS i) g
      |  WHERE len(l) > 0
      |), kept AS (
      |  SELECT doc_id, chunk_id, chunk,
      |    row_number() OVER (PARTITION BY chunk
      |                       ORDER BY doc_id, chunk_id) AS rn
      |  FROM ch
      |), ka AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |    string_agg(chunk, ' ' ORDER BY chunk_id) AS kept_text
      |  FROM kept WHERE rn = 1 GROUP BY doc_id
      |), pd AS (
      |  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id
      |)
      |SELECT d.doc_id, coalesce(pd.n_chunks, 0) AS n_chunks,
      |  coalesce(ka.n_kept, 0) AS n_kept, ka.kept_text
      |FROM (SELECT doc_id FROM documents) d
      |LEFT JOIN pd USING (doc_id)
      |LEFT JOIN ka USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_pii_redact" -> (q67PiiRedact _),
    "q68_chunk_dedup" -> ((s: SparkSession, d: String) => q68ChunkDedup(s, d)))

  val oracle: Map[String, String] = Map(
    "q67_pii_redact" -> q67Sql,
    "q68_chunk_dedup" -> q68Sql)
}
