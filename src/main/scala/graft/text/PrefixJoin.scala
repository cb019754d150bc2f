package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Prefix-filtered EXACT set-similarity self-join (AllPairs / PPJoin
  * family: Bayardo et al. 2007 "Scaling Up All Pairs Similarity
  * Search", Xiao et al. 2008) — the high-threshold exact counterpart
  * to the engine's two other near-dup joins:
  *
  *   - q25's inverted shingle index is exact but indexes EVERY token,
  *     so its candidate volume is Σ_token df² — fine at t=0.1 where
  *     prefixes would be nearly whole documents, wasteful at t≥0.7;
  *   - MinHash LSH is sub-quadratic but probabilistic (misses pairs).
  *
  * Prefix filtering is the production middle ground: order the corpus
  * vocabulary by ascending document frequency (rarest first) and index
  * only each document's first p = |x| − ⌈t·|x|⌉ + 1 tokens. Any pair
  * with Jaccard ≥ t must share at least one PREFIX token — if the two
  * prefixes were disjoint, the overlap is at most
  * min(|x|−p_x, |y|−p_y) = ⌈t·max(|x|,|y|)⌉ − 1, below the ⌈t·max⌉
  * that Jaccard ≥ t forces — so candidate generation is EXACT (no
  * recall loss), while the inverted index shrinks to the (1−t) rarest
  * fraction of each set, and precisely the tokens with the SMALLEST
  * df (cheapest df² terms) at that. A size filter
  * (t·|y| ≤ |x| ≤ |y|/t, integer-exact as cross-multiplications)
  * prunes candidates before verification; verification is the
  * codegen'd `sorted_intersect_count` two-pointer walk over per-doc
  * sorted hash sets, and the Jaccard test n·den ≥ num·(∪) is integer
  * arithmetic — the whole pipeline is float-free until the reported
  * jaccard column itself.
  *
  * Scale shape: df ranking and sizes are per-token / per-doc
  * aggregates (map-side partials); the prefix index self-join shuffles
  * only prefix tokens keyed by 8-byte hashes; candidate volume is
  * Σ_prefix-token df² over the RAREST tokens only. No all-pairs form
  * anywhere; the threshold is a rational (num/den), so no float-ceil
  * can silently shrink a prefix (a too-short prefix breaks EXACTNESS,
  * not just performance).
  */
object PrefixJoin {

  /** All pairs with trigram-shingle Jaccard ≥ tNum/tDen over a
    * (doc_id, text) relation. Output: (d1, d2, jaccard), d1 < d2. */
  def prefixJaccardJoin(docs: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"threshold must be in (0,1]: got $tNum/$tDen")
    val s = docs.sparkSession
    graft.functions.VecFunctions.register(s)

    // distinct (doc_id, h) shingle hashes; cached — referenced by the
    // df aggregate, the ranking join, the size aggregate, and the
    // verify arrays (4 consumers; q25's lifecycle argument)
    val tri = NearDup.hashedShinglesOf(docs).cache()

    val dfreq = tri.groupBy("h").agg(count(lit(1)).as("df"))

    // global canonical order: (df asc, h asc) — rarest tokens first.
    // sz rides the SAME doc-keyed window pass as the rank (count over
    // the full partition) instead of a separate aggregate + join —
    // one doc-keyed shuffle, not two.
    // ⌈t·sz⌉ via integer ceil-division: (num·sz + den − 1) div den.
    val wDoc = Window.partitionBy("doc_id")
    val ranked = tri.join(dfreq, "h")
      .withColumn("rank", row_number().over(wDoc.orderBy("df", "h")))
      .withColumn("sz", count(lit(1)).over(wDoc))
    val prefix = ranked.filter(col("rank") <=
        col("sz") - expr(s"(($tNum * sz) + ${tDen - 1}) div $tDen") + 1)
      .select("doc_id", "h", "sz")
      .cache()

    // candidate pairs: shared prefix token + integer-exact size filter
    // (t·|b| ≤ |a| and t·|a| ≤ |b|); dedup multiple shared tokens
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * tDen >= col("b.sz") * tNum &&
          col("b.sz") * tDen >= col("a.sz") * tNum)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

    // verify: two-pointer intersection over per-doc SORTED hash sets
    // (doc-bounded arrays — never corpus-bounded), then the integer
    // Jaccard test; the reported jaccard is the only float
    val lists = tri.groupBy("doc_id")
      .agg(sort_array(collect_list("h")).as("hs"), count(lit(1)).as("sz"))
      .cache()
    cand
      .join(lists.as("la"), col("d1") === col("la.doc_id"))
      .join(lists.as("lb"), col("d2") === col("lb.doc_id"))
      .withColumn("n_inter",
        expr("sorted_intersect_count(la.hs, lb.hs)").cast("long"))
      .filter(col("n_inter") * tDen >=
        (col("la.sz") + col("lb.sz") - col("n_inter")) * tNum)
      .select(col("d1"), col("d2"),
        (col("n_inter").cast("double") /
          (col("la.sz") + col("lb.sz") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Driver entry: exact Jaccard ≥ 0.7 pairs over the documents table.
    * Same naive-SQL oracle shape as q25 (string-trigram level — the
    * hash layer only renames join keys), but at the high threshold
    * where the prefix filter earns its keep, and with the integer
    * threshold test replicated verbatim. */
  def q85PrefixJoin(s: SparkSession, d: String): DataFrame =
    prefixJaccardJoin(documents(s, d), 7, 10)

  val q85Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS l
      |  FROM documents
      |), tri AS (
      |  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tri
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 2)) AS i) g
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
      |WHERE n_inter * 10 >= 7 * (sa.sz + sb.sz - n_inter)
      |ORDER BY d1, d2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_prefix_join" -> (q85PrefixJoin _))

  val oracle: Map[String, String] = Map(
    "q85_prefix_join" -> q85Sql)
}
