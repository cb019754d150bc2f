package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpointing
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
  * min. `Checkpointing.truncate` cuts the lineage each round so the plan
  * doesn't grow unboundedly — localCheckpoint by default; set a session
  * checkpoint dir (`sc.setCheckpointDir`) and the same call writes
  * reliable, executor-loss-surviving checkpoints instead (the cluster
  * deployment mode; see Checkpointing's scaladoc). Convergence is
  * detected by counting changed labels — a driver-side scalar, not a
  * collect of data.
  */
object DedupClusters {

  /** (doc_id, cluster_id) for every node, cluster_id = min doc_id of its
    * connected component in `pairs` (columns d1, d2). Nodes absent from
    * `pairs` are singletons labeled with themselves.
    *
    * Two-phase: min-label propagation (rounds = diameter — tiny on dup
    * graphs, which are near-cliques) with an automatic switch to the
    * O(log n)-round large-star/small-star alternation when a pathological
    * long-chain graph exhausts `maxIter`. The changed-label count is
    * computed as a `changed` column inside the same select that builds
    * the next labels frame, so detecting convergence is a filter-count
    * over the round's already-checkpointed blocks — not a second join.
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxIter: Int = 50, smallGraphEdges: Long = 1000000L): DataFrame = {
    // node-induced edge set, materialized ONCE: the edge count gates the
    // strategy (below), the small path collects it, and the iterative
    // path re-reads it every round — same truncate-for-multi-consumer
    // policy as the rest of the family. (Min-label was already
    // node-induced implicitly: a phantom endpoint has no label row, so
    // it dropped out of both sides of the round join.)
    val base = inducedEdges(nodes, pairs, "src", "dst")
    // SIZE-ADAPTIVE strategy, the AQE-broadcast move applied to graph
    // connectivity: a dup graph far smaller than the corpus (the common
    // real-world case — pairs are the OUTPUT of sub-quadratic pruning)
    // is solved driver-side with union-find over the collected edges
    // (bounded: ≤ smallGraphEdges × 16 B) and one broadcast join back,
    // ONE job instead of O(diameter) join+agg+checkpoint rounds. Graphs
    // past the threshold take the distributed paths below unchanged —
    // the count is a cheap scan of the checkpointed blocks, and the two
    // strategies are spec-pinned answer-equivalent.
    if (base.count() <= smallGraphEdges) {
      val s = nodes.sparkSession
      import s.implicits._
      val es = base.as[(Long, Long)].collect()
      // union-find, root = component min: attaching the larger root
      // under the smaller keeps every root the min id of its component
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != r) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val touched = es.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      val lbl = touched.map(x => (x, find(x))).toSeq.toDF("doc_id", "root")
      return nodes.join(broadcast(lbl), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("root"), col("doc_id")).as("cluster_id"))
    }
    // symmetrize: neighbor lists in both directions
    val edges = Checkpointing.truncate(
      base.union(base.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var labels = Checkpointing.truncate(
      nodes.select(col("doc_id"), col("doc_id").as("label")))
    def step(ls: DataFrame): (DataFrame, Long) = {
      val nbrMin = edges
        .join(ls.withColumnRenamed("doc_id", "dst_id"),
          col("dst") === col("dst_id"))
        .groupBy(col("src"))
        .agg(min("label").as("nbr_label"))
      val next = Checkpointing.truncate(ls
        .join(nbrMin, col("doc_id") === col("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"),
          // null nbr_label (isolated node) compares to null → filtered out
          (col("nbr_label") < col("label")).as("changed")))
      val ch = next.filter(col("changed")).count() // scans cached blocks only
      (next.select("doc_id", "label"), ch)
    }
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val (next, ch) = step(labels)
      changed = ch; labels = next; iter += 1
    }
    if (changed > 0)
      // component diameter exceeds maxIter (e.g. a 200-node chain):
      // min-label would need O(diameter) more rounds — switch to the
      // logarithmic-round algorithm instead of failing or crawling,
      // handing over the ALREADY-checkpointed induced edges (the star
      // pass must not re-derive them from raw pairs)
      connectedComponentsStar(nodes, pairs, prepared = Some(base))
    else
      labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Node-induced distinct edge set (self-loops dropped, endpoints
    * restricted to `nodes`), checkpointed — the ONE edge-prep shared
    * by both CC strategies, so the fallback handover can never drift
    * from the primary's restriction semantics. */
  private def inducedEdges(nodes: DataFrame, pairs: DataFrame,
      outA: String, outB: String): DataFrame = {
    val ids = nodes.select(col("doc_id"))
    Checkpointing.truncate(
      pairs.select(col("d1").as(outA), col("d2").as(outB))
        .filter(col(outA) =!= col(outB))
        .join(ids.withColumnRenamed("doc_id", outA), Seq(outA), "left_semi")
        .join(ids.withColumnRenamed("doc_id", outB), Seq(outB), "left_semi")
        .select(col(outA), col(outB)).distinct())
  }

  /** Large-star/small-star connected components — O(log n) rounds on ANY
    * graph shape (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014): alternate
    *   large-star: per node u, hook every neighbor v > u onto
    *               m = min(Γ(u) ∪ u);
    *   small-star: orient edges (larger → smaller), per node u hook every
    *               smaller neighbor and u itself onto m = min(Γ(u) ∪ u)
    * until the edge set is stable, at which point edges form stars
    * (node → component-min). Each operation is one groupBy-min plus one
    * equi-join on the node id — the same shuffle shape as one min-label
    * round, but the round COUNT is logarithmic, so chains and other
    * high-diameter graphs converge where label propagation cannot.
    */
  def connectedComponentsStar(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 64,
      prepared: Option[DataFrame] = None): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .distinct()
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).distinct()
      val mins = or.groupBy("u").agg(min("v").as("m")) // v ≤ u, so min ≤ u
      val fromNbrs = or.join(mins, "u").select(col("v").as("n"), col("m"))
      val fromSelf = mins.select(col("u").as("n"), col("m"))
      fromNbrs.union(fromSelf)
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
    }
    // restrict to the node-induced subgraph: min-label propagates only
    // labels that exist in `nodes`, so an edge endpoint absent from
    // `nodes` is inert there — but unrestricted star hooking would root
    // components at such phantom ids (cluster_ids no node carries →
    // keeper-less clusters downstream). The shared inducedEdges prep
    // keeps the two paths answer-equivalent, which the automatic
    // fallback depends on — and the fallback hands its already-
    // checkpointed edges over instead of re-deriving them.
    var e = prepared
      .map(_.toDF("u", "v"))
      .getOrElse(inducedEdges(nodes, pairs, "u", "v"))
    var stable = e.isEmpty
    var round = 0
    while (!stable && round < maxRounds) {
      val next = Checkpointing.truncate(smallStar(largeStar(e)))
      // set equality via symmetric difference — one job over two
      // checkpointed frames
      stable = next.exceptAll(e).union(e.exceptAll(next)).isEmpty
      e = next; round += 1
    }
    require(stable,
      s"large-star/small-star did not stabilize in $maxRounds rounds — " +
        "not reachable for any graph with < 2^64 nodes; indicates a bug")
    // stars: every non-root node has exactly one edge to its root
    nodes.join(e.select(col("u").as("doc_id"), col("v").as("root")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root"), col("doc_id")).as("cluster_id"))
  }

  // memoized per (session, dir, threshold): the driver contract runs
  // this twice per Verify (nq_dedup_clusters + the curation pipeline) —
  // the iterative CC prefix is label-propagation over cached frames, so
  // recomputing it is pure waste
  private val ccCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Double), DataFrame]

  /** Drop memoized cluster assignments so the next call recomputes the
    * full pipeline — the bench calls this before every timed run
    * (otherwise run 2 of best-of-2 noop-reads the checkpoint and the
    * bench stops measuring the operator). Checkpoint blocks are
    * reclaimed by the ContextCleaner once unreferenced.
    */
  private[graft] def clearMemo(): Unit = ccCache.clear()

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
    if (graft.Tables.isImmutable(d)) {
      // evict stopped sessions' entries (see Curation.curate)
      ccCache.keys.filter(_._1.sparkContext.isStopped)
        .foreach(ccCache.remove)
      ccCache.getOrElseUpdate((s, d, threshold),
        Checkpointing.truncate(build()))
    } else build()
  }

  /** Oracle-checked variant of the cluster assignment: connected
    * components over the EXACT jaccard ≥ 0.5 pair relation (q25's
    * inverted-index join) rather than the MinHash-banded one. The two
    * pair relations agree on this corpus, but they are DIFFERENT
    * relations in general (MinHash recall is probabilistic) — so q63
    * pins the CC/keeper semantics against exact pairs, while
    * nq_dedup_clusters (the banded path) carries its own oracle built
    * on NearDup's full hash-family replica (round 8): same recursive
    * reach, edges = the replicated banded pairs.
    */
  def q63DedupClusters(s: SparkSession, d: String): DataFrame = {
    val pairs = TextQueries.q25NeardupJaccard(s, d)
      .filter(col("jaccard") >= 0.5).select("d1", "d2")
    connectedComponents(documents(s, d).select("doc_id"), pairs)
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_keeper"))
      .orderBy("doc_id")
  }

  /** Source-priority keeper selection — the policy real curation runs:
    * among near-duplicates, keep the copy from the most TRUSTED source
    * (curated/licensed beats crawl), falling back to min doc_id only
    * within a priority tier. `priority` maps source → rank (lower wins);
    * unlisted sources get `defaultPrio`. With an empty map this
    * degenerates to the min-doc_id policy (spec-pinned against q63).
    *
    * Scale shape: priorities attach via a narrow CASE projection (the
    * recipe is a literal, no join); the winner per cluster is the same
    * skew-proof `min(struct)` partial aggregate as q68/q73 — a
    * million-member cluster collapses map-side — and the keeper joins
    * back cluster-keyed. Nothing is collected, nothing broadcast beyond
    * AQE's own choices.
    */
  def priorityKeepers(clusters: DataFrame, docsSrc: DataFrame,
      priority: Map[String, Int], defaultPrio: Int = 1): DataFrame = {
    val prioCol = priority.foldLeft(lit(defaultPrio)) { case (acc, (sv, p)) =>
      when(col("source") === sv, lit(p)).otherwise(acc)
    }.cast("long")
    val pr = clusters.select("doc_id", "cluster_id")
      .join(docsSrc.select(col("doc_id"), prioCol.as("prio")), Seq("doc_id"))
    val win = pr.groupBy("cluster_id")
      .agg(min(struct(col("prio"), col("doc_id"))).as("w"))
      .select(col("cluster_id"), col("w.doc_id").as("keeper_id"))
    pr.join(win, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_keeper"))
  }

  /** Driver recipe: two "curated" sources outrank the rest. Shared with
    * the q78 oracle CASE below. */
  private[text] val keeperRecipe: Map[String, Int] =
    Map("src3" -> 0, "src7" -> 0)

  def q78PriorityKeepers(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val pairs = TextQueries.q25NeardupJaccard(s, d)
      .filter(col("jaccard") >= 0.5).select("d1", "d2")
    val cl = connectedComponents(docs.select("doc_id"), pairs)
    priorityKeepers(cl, docs.select("doc_id", "source"), keeperRecipe)
      .orderBy("doc_id")
  }

  // The pair CTEs mirror q25's oracle (same shingling/df-cap/threshold);
  // `reach` computes, per node, every component label reachable through
  // the symmetrized edges — UNION dedup guarantees termination, min =
  // the component's min doc_id, Spark's cluster_id policy.
  // list_filter strips empty tokens — same reasoning as q25's oracle.
  // The CTE chain is shared verbatim with Curation's q64 oracle, which
  // appends its own gate CTEs after `reach`.
  private[text] val reachCtes: String =
    """WITH RECURSIVE toks AS (
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
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT d1, d2 FROM inter
      |  JOIN sizes sa ON d1 = sa.doc_id
      |  JOIN sizes sb ON d2 = sb.doc_id
      |  WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= 0.5
      |), edges AS (
      |  SELECT d1 AS u, d2 AS v FROM pairs
      |  UNION SELECT d2, d1 FROM pairs
      |), reach(doc_id, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.u, r.label FROM reach r JOIN edges e ON e.v = r.doc_id
      |)""".stripMargin

  /** Shared final select over any `reach(doc_id, label)` relation. */
  private[text] val clusterSelect: String =
    """
      |SELECT doc_id, min(label) AS cluster_id,
      |  (doc_id = min(label)) AS is_keeper
      |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val q63Sql: String = reachCtes + clusterSelect

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_dedup_clusters" -> ((s: SparkSession, d: String) => dedupClusters(s, d)),
    "q63_dedup_clusters" -> (q63DedupClusters _),
    "q78_priority_keepers" -> (q78PriorityKeepers _))

  // q78 oracle: q63's exact reach, then the keeper chosen by
  // (priority, doc_id) — the CASE is generated from keeperRecipe so the
  // two engines share one source of truth for the priority table.
  private lazy val q78Sql: String = {
    val cases = keeperRecipe.toSeq.sortBy(_._1)
      .map { case (sv, p) => s"WHEN '$sv' THEN $p" }.mkString(" ")
    reachCtes + s""",
      |cl AS (
      |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
      |), pr AS (
      |  SELECT c.doc_id, c.cluster_id,
      |    CAST(CASE d.source $cases ELSE 1 END AS BIGINT) AS prio
      |  FROM cl c JOIN documents d ON c.doc_id = d.doc_id
      |), win AS (
      |  SELECT cluster_id, doc_id AS keeper_id FROM (
      |    SELECT cluster_id, doc_id,
      |      row_number() OVER (PARTITION BY cluster_id
      |                         ORDER BY prio, doc_id) AS rn
      |    FROM pr) WHERE rn = 1
      |)
      |SELECT p.doc_id, p.cluster_id, w.keeper_id,
      |  (p.doc_id = w.keeper_id) AS is_keeper
      |FROM pr p JOIN win w ON p.cluster_id = w.cluster_id
      |ORDER BY p.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q63_dedup_clusters" -> q63Sql,
    // round-8 promotion: the BANDED path's own oracle — reach over
    // NearDup's replicated minhash-band pair relation
    "nq_dedup_clusters" -> (NearDup.bandedReachCtes + clusterSelect),
    "q78_priority_keepers" -> q78Sql)
}
