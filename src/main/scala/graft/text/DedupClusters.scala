package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Duplicate-cluster grouping: connected components over near-dup pairs,
  * then keeper selection — the step that turns pair detection into an
  * actual corpus dedup (SURVEY §2.K near-dup row: "approxSimilarityJoin +
  * connected components").
  *
  * Algorithm: iterative min-label propagation in DataFrames. Every node
  * starts labeled with its own id; each round every node takes the min of
  * its label and its neighbors' labels; fixed point = every node carries
  * the min doc_id of its component. Rounds needed = graph diameter —
  * near-dup components are dense (near-cliques of mutual dups), so the
  * diameter is tiny in practice; maxIter bounds pathological chains.
  * (The O(log n)-round alternative for adversarial graphs is the
  * large-star/small-star algorithm of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" — same DataFrame shape, more
  * rounds logic; not needed for dup graphs.)
  *
  * Scale shape: per round, one equi-join edges⋈labels (shuffle keyed on
  * doc_id — 8-byte keys, volume linear in the pair count) + one groupBy
  * min. `localCheckpoint` truncates the lineage each round so the plan
  * doesn't grow unboundedly (on a real cluster use a reliable
  * `checkpoint` dir instead). Convergence is detected by counting changed
  * labels — a driver-side scalar, not a collect of data.
  */
object DedupClusters {

  /** (doc_id, cluster_id) for every node, cluster_id = min doc_id of its
    * connected component in `pairs` (columns d1, d2). Nodes absent from
    * `pairs` are singletons labeled with themselves.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // symmetrize: neighbor lists in both directions
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct().localCheckpoint()
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    def step(ls: DataFrame): (DataFrame, Long) = {
      val nbrMin = edges
        .join(ls.withColumnRenamed("doc_id", "dst_id"),
          col("dst") === col("dst_id"))
        .groupBy(col("src"))
        .agg(min("label").as("nbr_label"))
      val next = ls
        .join(nbrMin, col("doc_id") === col("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint()
      val ch = next.as("n")
        .join(ls.as("o"), col("n.doc_id") === col("o.doc_id"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      (next, ch)
    }
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val (next, ch) = step(labels)
      changed = ch; labels = next; iter += 1
    }
    if (changed > 0) {
      // the loop hit the iteration cap with the final round still
      // changing labels: one extra probe distinguishes "converged exactly
      // at maxIter" from true non-convergence. A silent non-convergence
      // would split one true cluster into several, each electing its own
      // keeper — fail loudly instead (raise maxIter for graphs with
      // genuinely larger diameter).
      val (next, ch) = step(labels)
      changed = ch; labels = next
      require(changed == 0,
        s"connectedComponents did not converge in $maxIter iterations " +
          s"($changed labels still changing) — component diameter " +
          "exceeds maxIter; raise it")
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  // memoized per (session, dir, threshold): the driver contract runs
  // this twice per Verify (nq_dedup_clusters + the curation pipeline) —
  // the iterative CC prefix is label-propagation over cached frames, so
  // recomputing it is pure waste
  private val ccCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  /** Full dedup assignment over the documents corpus: near-dup pairs from
    * the columnar MinHash path → components → (doc_id, cluster_id,
    * is_keeper). keeper = min doc_id per cluster (deterministic, same
    * policy as exact dedup q23). Downstream dedup = `filter(is_keeper)`.
    */
  def dedupClusters(s: SparkSession, d: String,
      threshold: Double = 0.5): DataFrame = {
    def build() = {
      val pairs = NearDup.minhashNeardupFast(s, d, threshold = threshold)
        .select("d1", "d2")
      val nodes = documents(s, d).select("doc_id")
      connectedComponents(nodes, pairs)
        .select(col("doc_id"), col("cluster_id"),
          (col("doc_id") === col("cluster_id")).as("is_keeper"))
        .orderBy("doc_id")
    }
    // memoize only the immutable driver data — a mutable fixture dir
    // rewritten in place must never serve a stale checkpoint
    if (graft.Tables.isImmutable(d))
      ccCache.getOrElseUpdate((s, d, threshold), build().localCheckpoint())
    else build()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_dedup_clusters" -> ((s: SparkSession, d: String) => dedupClusters(s, d)))
}
