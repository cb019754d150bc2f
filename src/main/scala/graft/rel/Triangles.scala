package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-node triangle counting + local clustering coefficient — the
  * link-farm / tight-clique detector of host-graph curation (a node
  * whose neighborhood is abnormally self-connected is a spam-farm
  * signature; the complement of [[PageRank]]'s popularity prior and
  * [[LabelProp]]'s communities). Algorithm: the ordered wedge-closing
  * join of Schank & Wagner 2005 ("Finding, Counting and Listing all
  * Triangles in Large Graphs") — canonicalize to a simple undirected
  * edge set with a < b, enumerate wedges a<b<c through the shared
  * middle vertex, close them against the edge set, so every triangle
  * is produced EXACTLY once.
  *
  * Counts and degrees are all-integer (exact oracle, no rounding);
  * the clustering coefficient 2T/(d(d−1)) is one fixed double tree
  * over those integers, rounded for display only.
  *
  * Scale shape — DEGREE-ORDERED ORIENTATION (round 13, replacing the
  * id-ordered wedge join): each undirected edge is directed from its
  * lower-(degree, id) endpoint to the higher, and wedges are
  * enumerated at the APEX — the triangle's ≺-minimal vertex — as
  * out-neighbor pairs, closed against the oriented edge set. This is
  * the standard answer to "the curse of the last reducer" (Suri &
  * Vassilvitskii 2011, WWW; Schank & Wagner 2005's sequential
  * forward-algorithm invariant): under this orientation every
  * out-degree is O(√m), so per-key wedge work is bounded and total
  * wedge volume is O(m^{3/2}) REGARDLESS of degree skew — where the
  * naive id-ordered join does Σd² work and funnels a Zipfian hub's d²
  * wedges through the hub's single join key (one hot, un-splittable
  * task at crawl scale; measured in BASELINE.md's power-law probe).
  * Each triangle still closes exactly once (at its unique apex, with
  * its out-neighbors in ≺ order), then a map-side-combined
  * explode-count and a broadcast-sized join back onto degrees.
  */
object Triangles {

  /** (id, degree, triangles, lcc) over the undirected simplification
    * of `edges`; nodes from `nodes` (or edge endpoints) with degree
    * < 2 carry lcc null. */
  def triangleStats(edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodes: Option[DataFrame] = None): DataFrame = {
    val e0 = edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
      .filter(col("s") =!= col("t"))
    // simple undirected canonical form: unordered pair, a < b, deduped
    val und = e0.select(least(col("s"), col("t")).as("a"),
        greatest(col("s"), col("t")).as("b"))
      .distinct().cache()
    val univ = nodes.getOrElse(
        e0.select(col("s")).union(e0.select(col("t"))))
      .toDF("id").distinct()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    // orient u→v iff (deg(u), u) ≺ (deg(v), v); a < b, so a degree tie
    // keeps a→b. dv rides along so the apex can ≺-order its
    // out-neighbors without another degree join.
    val oriented = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"),
        when(col("da") <= col("db"), col("db")).otherwise(col("da"))
          .as("dv"))
      .cache() // reused: two wedge sides + the closure side
    // wedges at the apex: out-neighbor pairs v ≺ w — the apex key u is
    // the LOWEST-degree vertex of the wedge, so out-degrees (≤ O(√m))
    // bound every join key's fan-out, hubs included
    val w = oriented
      .join(oriented.select(col("u"), col("v").as("w0"),
        col("dv").as("dw")), "u")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w0")))
    // the closing edge is oriented v→w0 precisely because v ≺ w0
    val tri = w.join(
        oriented.select(col("u").as("v"), col("v").as("w0")),
        Seq("v", "w0"))
      .select(explode(array(col("u"), col("v"), col("w0"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    val out = univ
      .join(deg, Seq("id"), "left")
      .join(tri, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - lit(1.0)))))
    // eager materialization, then release both cached relations — the
    // PageRank convention: callers get a computed frame, not a lazy
    // plan pinning executor storage
    val computed = out.localCheckpoint()
    oriented.unpersist(false)
    und.unpersist(false)
    computed
  }

  // ---------------------------------------------------------------- q106
  /** Contract entry: triangle stats over the shared citation graph,
    * full doc universe. Integer columns exact; lcc is the fixed tree
    * rounded 6 (non-negative — no sign guard needed). */
  def q106Triangles(s: SparkSession, d: String): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    triangleStats(PageRank.citationEdges(s, d),
        nodes = Some(docs.select(col("doc_id"))))
      .select(col("id").as("doc_id"), col("degree"), col("triangles"),
        round(col("lcc"), 6).as("lcc"))
      .orderBy("doc_id")
  }

  private[rel] val q106Sql: String =
    s"""WITH ${PageRank.citationEdgesSql},
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges),
       |deg AS (
       |  SELECT id, count(*) AS degree FROM (
       |    SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) t
       |  GROUP BY id),
       |tri AS (
       |  SELECT id, count(*) AS triangles FROM (
       |    SELECT unnest([w.a, w.b, w.c]) AS id
       |    FROM (SELECT e1.a, e1.b, e2.b AS c
       |          FROM und e1 JOIN und e2 ON e1.b = e2.a) w
       |    JOIN und e3 ON e3.a = w.a AND e3.b = w.c) x
       |  GROUP BY id)
       |SELECT n.id AS doc_id,
       |  COALESCE(deg.degree, 0) AS degree,
       |  COALESCE(tri.triangles, 0) AS triangles,
       |  round(CASE WHEN COALESCE(deg.degree, 0) >= 2
       |    THEN 2.0 * COALESCE(tri.triangles, 0)
       |      / (CAST(deg.degree AS DOUBLE) * (CAST(deg.degree AS DOUBLE) - 1.0))
       |    END, 6) AS lcc
       |FROM nodes n
       |LEFT JOIN deg ON deg.id = n.id
       |LEFT JOIN tri ON tri.id = n.id
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_triangles" -> (q106Triangles _))

  val oracle: Map[String, String] = Map(
    "q106_triangles" -> q106Sql)
}
