package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components dup-cluster grouping (SURVEY §2.K near-dup row:
  * pairs → components → keeper).
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("components equal the transitive closure of the pair set") {
    // chain 1-2-3 (1-3 never paired directly), clique {10,11}, singleton 7,
    // and a second chain 20-21-22-23 with shuffled edge order
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (21L, 20L), (22L, 21L),
      (23L, 22L)).toDF("d1", "d2")
    val nodes = Seq(1L, 2L, 3L, 7L, 10L, 11L, 20L, 21L, 22L, 23L)
      .toDF("doc_id")
    val got = DedupClusters.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 10L -> 10L,
      11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    assert(got === want)
  }

  test("long path converges within maxIter (worst-case diameter)") {
    val n = 12L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val nodes = (0L until n).toDF("doc_id")
    val got = DedupClusters.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(0L), s"all nodes should label 0: $got")
  }

  test("200-node chain: min-label exhausts maxIter, falls back to star, converges") {
    // diameter 199 ≫ maxIter=10 — min-label alone cannot finish; the
    // automatic large-star/small-star fallback must (in O(log n) rounds)
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("d1", "d2")
    val nodes = (0L until n).toDF("doc_id")
    val got = DedupClusters.connectedComponents(nodes, pairs, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    assert(got.values.toSet === Set(0L), "chain should collapse to root 0")
  }

  test("large-star/small-star agrees with min-label on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3) {
      val nNodes = 60
      val edges = Seq.fill(50)(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter(p => p._1 != p._2)
      val pairs = edges.toDF("d1", "d2")
      val nodes = (0L until nNodes.toLong).toDF("doc_id")
      // smallGraphEdges = 0 forces the distributed min-label rounds —
      // the default would solve 50 edges on the driver
      val viaLabels = DedupClusters.connectedComponents(nodes, pairs,
          maxIter = 100, smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStars = DedupClusters.connectedComponentsStar(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // and the adaptive union-find fast path must agree with both
      val viaUnionFind = DedupClusters.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStars === viaLabels)
      assert(viaUnionFind === viaLabels,
        "the driver-side fast path must be answer-equivalent")
    }
  }

  test("dedupClusters on sf0.001: keepers are cluster minima, clusters cover all docs") {
    val d = sf0001
    val out = DedupClusters.dedupClusters(spark, d).cache()
    val nDocs = graft.Tables.documents(spark, d).count()
    assert(out.count() === nDocs) // every doc assigned
    // keeper = min doc_id of its cluster, exactly one keeper per cluster
    val bad = out.groupBy("cluster_id")
      .agg(min("doc_id").as("mn"), sum(when(col("is_keeper"), 1).otherwise(0)).as("nk"))
      .filter(col("mn") =!= col("cluster_id") || col("nk") =!= 1)
      .count()
    assert(bad === 0)
    // consistency with the pair set: every near-dup pair is in one cluster
    val pairs = NearDup.minhashNeardupFast(spark, d).select("d1", "d2")
    val lab = out.select("doc_id", "cluster_id")
    val split = pairs
      .join(lab.withColumnRenamed("doc_id", "d1").withColumnRenamed("cluster_id", "c1"), "d1")
      .join(lab.withColumnRenamed("doc_id", "d2").withColumnRenamed("cluster_id", "c2"), "d2")
      .filter(col("c1") =!= col("c2")).count()
    assert(split === 0)
    out.unpersist()
  }

  test("priority keepers: trusted source beats lower id; ties fall back to id") {
    import spark.implicits._
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // one cluster of three
      (4L, 4L), (5L, 4L),           // tie on priority
      (9L, 9L)                      // singleton
    ).toDF("doc_id", "cluster_id")
    val srcs = Seq(
      (1L, "src0"), (2L, "src3"), (3L, "src0"),
      (4L, "src3"), (5L, "src3"), (9L, "src0")
    ).toDF("doc_id", "source")
    val out = DedupClusters.priorityKeepers(clusters, srcs,
        Map("src3" -> 0, "src7" -> 0))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(out(1L) === ((2L, false)), "curated src3 doc 2 outranks doc 1")
    assert(out(2L) === ((2L, true)))
    assert(out(3L) === ((2L, false)))
    assert(out(4L) === ((4L, true)), "priority tie falls back to min id")
    assert(out(5L) === ((4L, false)))
    assert(out(9L) === ((9L, true)), "singleton keeps itself")
  }

  test("priority keepers: empty recipe degenerates to q63's min-id policy") {
    val docs = graft.Tables.documents(spark, sf0001)
    val cl = DedupClusters.dedupClusters(spark, sf0001)
      .select("doc_id", "cluster_id")
    val out = DedupClusters.priorityKeepers(cl,
      docs.select("doc_id", "source"), Map.empty).cache()
    // cluster_id IS the min doc_id by CC construction → keeper_id == it
    assert(out.filter(col("keeper_id") =!= col("cluster_id")).count() === 0)
    // exactly one keeper per cluster, and it is a member
    val bad = out.groupBy("cluster_id")
      .agg(sum(when(col("is_keeper"), 1).otherwise(0)).as("nk"))
      .filter(col("nk") =!= 1).count()
    assert(bad === 0)
    out.unpersist()
  }
}
