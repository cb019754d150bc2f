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
  * Scale shape: one edge-canonicalization pass, then two self
  * equi-joins of the (deduped) edge table — the join keys are single
  * vertex ids, so this is the standard distributed triangle plan
  * (shuffle ∝ wedge count Σd²; the classic mitigation for power-law
  * skew at 100 TB is degree-ordered orientation, which the a<b<c
  * canonical order already approximates on hash-random ids), then a
  * map-side-combined explode-count and a broadcast-sized join back
  * onto degrees.
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
    // wedges a<b<c through middle vertex b, closed against (a, c)
    val w = und.toDF("a", "b")
      .join(und.toDF("b", "c"), "b")
      .filter(col("a") < col("c")) // redundant given a<b<c, kept explicit
    val tri = w.join(und.toDF("a", "c"), Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
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
    und.unpersist(false)
    out
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
