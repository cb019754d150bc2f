package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Example-level sequence packing via best-fit-decreasing bin packing —
  * the NON-SPLITTING counterpart to q56/q58's concatenate-and-cut
  * packing: each document lands INTACT in exactly one fixed-capacity
  * bin (attention windows never straddle document boundaries — the
  * packing discipline used when cross-document attention contamination
  * matters), and the packer's job is to waste as few pad tokens as
  * possible.
  *
  * Best-fit-decreasing is the classic guarantee-carrying heuristic
  * (≤ 11/9·OPT + 1 bins, Johnson 1973, same family as first-fit-
  * decreasing): sort items descending, place each into the fullest bin
  * that still fits (TreeMap on residual capacity → O(d log d) per
  * group). The sequential decision chain makes it non-relational BY
  * NATURE, so it runs inside `flatMapGroups` over (lang, shard) groups
  * — the deterministic hash-shard deal (`TrainPrep.shuffleShard`)
  * bounds every group to ~corpus/nShards docs, which is the same
  * "shard = the unit of sequential work" contract q58 established.
  * Oversize docs (longer than the capacity) get singleton bins flagged
  * `oversize` rather than silent truncation.
  *
  * Deterministic: (n_tokens desc, doc_id) placement order, bin ids
  * assigned in creation order, ties in residual capacity broken by bin
  * id (TreeMap key (residual, bin_id)). Rows-only checked by the
  * driver; the packing QUALITY (pad waste vs the q56 baseline and vs
  * the ceil(total/capacity) lower bound) is spec-pinned — the property
  * a hash can't express.
  */
object BinPack {

  /** Pack docs (idCol, lengths from `nTokensCol`) per group into bins
    * of `capacity`. Output: one row per doc with its bin assignment
    * and per-bin bookkeeping columns. */
  def packBestFit(docs: DataFrame, groupCols: Seq[String], idCol: String,
      nTokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"packBestFit: capacity must be positive, " +
      s"got $capacity")
    require(groupCols.nonEmpty,
      "packBestFit: group columns bound the sequential work per task — " +
        "pack an unsharded corpus through TrainPrep.shuffleShard first")
    val s = docs.sparkSession
    import s.implicits._
    // group key via to_json(struct(...)) (r18 review): the previous
    // NUL-joined cast-to-string key DROPPED null group values (a
    // null-lang doc silently merged into a phantom group) and
    // corrupted on an embedded \u0000; the original group columns
    // and their TYPES are recovered by joining the assignment back on
    // the id below — never by parsing the key string
    val keyed = docs
      // a null id cannot round-trip the join-back; surfaced by count
      // delta, not packed under a fabricated id
      .filter(col(idCol).isNotNull)
      .select(
        to_json(struct(groupCols.map(col): _*)).as("gkey"),
        col(idCol).cast("long").as("pid"),
        // null token counts (null text) pack as 0-length items: the
        // doc keeps its slot instead of NPE-ing the typed encoder
        // (the Curation null-text class, r18)
        coalesce(col(nTokensCol).cast("long"), lit(0L)).as("ntok"))
      .as[(String, Long, Long)]
    val packed = keyed.groupByKey(_._1).flatMapGroups { (gkey, it) =>
      val items = it.map { case (_, id, n) => (id, n) }.toArray
      // descending length, id tie-break: the BFD order
      java.util.Arrays.sort(items,
        new java.util.Comparator[(Long, Long)] {
          def compare(a: (Long, Long), b: (Long, Long)): Int = {
            val c = java.lang.Long.compare(b._2, a._2)
            if (c != 0) c else java.lang.Long.compare(a._1, b._1)
          }
        })
      // bins keyed by (residual, binId): best fit = smallest residual
      // ≥ n = ceilingKey((n, -1)); deterministic tie-break on binId
      val bins = new java.util.TreeMap[(Long, Long), Long](
        new java.util.Comparator[(Long, Long)] {
          def compare(a: (Long, Long), b: (Long, Long)): Int = {
            val c = java.lang.Long.compare(a._1, b._1)
            if (c != 0) c else java.lang.Long.compare(a._2, b._2)
          }
        })
      var nextBin = 0L
      val out = new scala.collection.mutable.ArrayBuffer[
        (Long, Long, Long, Boolean)](items.length)
      for ((id, n) <- items) {
        if (n > capacity) { // oversize: singleton bin, flagged
          out += ((id, n, nextBin, true))
          nextBin += 1
        } else {
          val e = bins.ceilingEntry((n, -1L))
          val bin = if (e == null) {
            val b = nextBin; nextBin += 1
            bins.put((capacity - n, b), b)
            b
          } else {
            val (res, b) = e.getKey
            bins.remove(e.getKey)
            bins.put((res - n, b), b)
            b
          }
          out += ((id, n, bin, false))
        }
      }
      out.iterator
    }.toDF("pid", "ntok", "bin_id", "oversize")
    // group columns and types recovered from the INPUT by id — the
    // id-keyed join is assignment-sized and broadcastable per shard
    docs.select((groupCols.map(col) :+ col(idCol)).distinct: _*)
      .join(packed, col(idCol).cast("long") === col("pid"))
      .select(groupCols.map(col) ++
        Seq(col(idCol), col("ntok").as(nTokensCol),
          col("bin_id"), col("oversize")): _*)
  }

  private[text] val PackDumpDir = "/tmp/graft_pack_oracle"
  private val Capacity = 2048L

  /** Driver entry: documents hash-dealt into 8 shards per language,
    * best-fit-decreasing packed into 2048-token bins; one row per bin
    * with fill accounting. Deterministic (hash deal + BFD order). The
    * per-doc assignment is dumped as oracle input: DuckDB rebuilds the
    * per-bin aggregate from it GUARDED by the packing invariants
    * (every document exactly once with its true token count, fills
    * within capacity unless flagged oversize, oversize bins singleton,
    * bin ids dense from 0 per group) — any violation empties the
    * oracle result, so the driver's row-count check fails. The BFD
    * placement CHOICE itself is inherently sequential (spec-pinned:
    * beats next-fit, repartition-invariant, near the 11/9·OPT bound);
    * everything SQL can say about the output is hash-checked. */
  def nqPackBins(s: SparkSession, d: String, capacity: Long = Capacity,
      nShards: Int = 8): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("lang"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
    val sharded = docs.join(
      graft.text.TrainPrep.shuffleShard(docs, "doc_id", nShards),
      "doc_id")
    val assigned = packBestFit(sharded, Seq("lang", "shard"), "doc_id",
        "n_tokens", capacity)
      .withColumn("shard", col("shard").cast("long"))
    graft.OracleDump.dump(
      assigned.select(col("lang"), col("shard"), col("doc_id"),
        col("n_tokens"), col("bin_id"), col("oversize")),
      PackDumpDir)
    assigned
      .groupBy("lang", "shard", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("fill_tokens"),
        max(col("oversize").cast("int")).as("oversize"))
      .orderBy("lang", "shard", "bin_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_pack_bins" -> ((s: SparkSession, d: String) => nqPackBins(s, d)))

  /** Per-bin aggregate over the dumped assignment, guarded by the
    * invariants. A violated invariant makes the guard row non-empty
    * and the final WHERE empties the output → rows mismatch. */
  val oracle: Map[String, String] = Map(
    "nq_pack_bins" ->
      s"""WITH a AS (
         |  SELECT * FROM read_parquet('$PackDumpDir/*.parquet')),
         |bad_doc AS (
         |  -- every document exactly once, with its true token count
         |  SELECT d.doc_id FROM documents d
         |  LEFT JOIN a ON d.doc_id = a.doc_id
         |  WHERE a.doc_id IS NULL
         |     OR len(regexp_split_to_array(d.text, '\\s+')) <> a.n_tokens
         |  UNION ALL
         |  SELECT doc_id FROM a GROUP BY doc_id HAVING count(*) <> 1),
         |bad_bin AS (
         |  SELECT lang, shard, bin_id FROM a
         |  GROUP BY lang, shard, bin_id
         |  HAVING (NOT bool_or(oversize)
         |          AND sum(n_tokens) > $Capacity)       -- overfull
         |      OR (bool_or(oversize)
         |          AND (count(*) <> 1                   -- not singleton
         |               OR max(n_tokens) <= $Capacity)) -- not oversize
         |  UNION ALL
         |  -- bin ids dense from 0 within each (lang, shard)
         |  SELECT lang, shard, -1 FROM a
         |  GROUP BY lang, shard
         |  HAVING min(bin_id) <> 0
         |      OR max(bin_id) + 1 <> count(DISTINCT bin_id)),
         |ok AS (SELECT (SELECT count(*) FROM bad_doc)
         |            + (SELECT count(*) FROM bad_bin) = 0 AS v)
         |SELECT lang, shard, bin_id,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS fill_tokens,
         |  max(CASE WHEN oversize THEN 1 ELSE 0 END) AS oversize
         |FROM a CROSS JOIN ok
         |WHERE ok.v
         |GROUP BY lang, shard, bin_id
         |ORDER BY lang, shard, bin_id""".stripMargin)
}
