package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Link-graph operators: PageRank mass conservation / closed forms,
  * HITS hub-authority separation on structurally obvious graphs, and
  * the conventions both share (parallel-edge multiplicity, isolated
  * nodes, caller-supplied universes).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*) = es.toSeq.toDF("src", "dst")
  private def nodes(ids: Long*) = ids.toSeq.toDF("id")

  // --------------------------------------------------------- PageRank

  test("pagerank: total rank mass is 1 at any depth, dangling included") {
    // 1→2, 2 dangling, 3 isolated (in universe only)
    val r = PageRank.pageRank(edges((1L, 2L)), iters = 7,
        nodes = Some(nodes(1L, 2L, 3L)))
      .agg(sum("r")).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("pagerank: k-cycle is the uniform fixpoint, exactly preserved") {
    // on a cycle every node has outdeg 1 and indeg 1 → r stays 1/N
    val r = PageRank.pageRank(edges((0L, 1L), (1L, 2L), (2L, 0L)),
        iters = 5)
      .select("r").as[Double].collect()
    assert(r.length == 3 && r.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pagerank: in-link mass ranks the sink above its sources") {
    val r = PageRank.pageRank(edges((1L, 3L), (2L, 3L)), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(3L) > r(1L) && math.abs(r(1L) - r(2L)) < 1e-15)
  }

  test("pagerank: parallel edges carry multiplied weight") {
    // 1 splits across {2,3}; a doubled 1→2 edge shifts 2/3 of 1's
    // contribution to node 2 (weighted-surfer convention)
    val single = PageRank.pageRank(edges((1L, 2L), (1L, 3L)), iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val doubled = PageRank.pageRank(edges((1L, 2L), (1L, 2L), (1L, 3L)),
        iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(single(2L) - single(3L)) < 1e-15)
    assert(doubled(2L) > doubled(3L))
  }

  // ------------------------------------------------------------- HITS

  test("hits: star graph separates the hub from the authorities") {
    // 0 → {1,2,3}: node 0 is the only hub, 1-3 split authority evenly
    val m = Hits.hits(edges((0L, 1L), (0L, 2L), (0L, 3L)), iters = 3)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(m(0L)._2 - 1.0) < 1e-12)      // all hub mass
    assert(m(0L)._1 == 0.0)                        // no authority
    Seq(1L, 2L, 3L).foreach { v =>
      assert(math.abs(m(v)._1 - 1.0 / 3) < 1e-12)  // even authority
      assert(m(v)._2 == 0.0)                       // no hub
    }
  }

  test("hits: both score vectors sum to 1 (L1 normalization)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Hits.hits(PageRank.citationEdges(spark, sf0001), iters = 5,
      nodes = Some(docs.select(col("doc_id"))))
    val sums = out.agg(sum("auth"), sum("hub")).as[(Double, Double)].head()
    assert(math.abs(sums._1 - 1.0) < 1e-9 && math.abs(sums._2 - 1.0) < 1e-9)
  }

  test("hits: parallel edges weight the hub that repeats its link") {
    // 1→3 twice, 2→3 once: one authority, hubs split 2:1
    val m = Hits.hits(edges((1L, 3L), (1L, 3L), (2L, 3L)), iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(math.abs(m(1L) - 2.0 / 3) < 1e-12)
    assert(math.abs(m(2L) - 1.0 / 3) < 1e-12)
  }

  test("personalized pagerank: mass stays 1, seeds dominate, a node " +
      "unreachable from the seeds ranks (1-d) lower tier than seeds") {
    // chain 1 -> 2 -> 3, seed {1}; node 9 isolated in the universe
    val r = PageRank.pageRank(edges((1L, 2L), (2L, 3L)), iters = 8,
        nodes = Some(nodes(1L, 2L, 3L, 9L)),
        seeds = Some(nodes(1L)))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
    // theorems for THIS fixture (global "seed dominates" is not one:
    // the dangling tail 3 legitimately accumulates the most mass at
    // d = 0.85): the seed out-ranks its direct successor — 2's only
    // inflow is 0.85 × r(1) while 1 keeps the full teleport — and a
    // zero-teleport node with no in-links ranks exactly 0
    assert(r(1L) > r(2L), s"seed must out-rank its successor: $r")
    assert(r(3L) > 0.0 && r(9L) == 0.0,
      "reachable accumulates, unreachable is exactly 0")
  }

  test("personalized pagerank with the full universe as seeds equals " +
      "uniform pagerank") {
    val u = nodes(1L, 2L, 3L)
    val uni = PageRank.pageRank(edges((1L, 2L), (2L, 3L)), iters = 4,
        nodes = Some(u)).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val ppr = PageRank.pageRank(edges((1L, 2L), (2L, 3L)), iters = 4,
        nodes = Some(u), seeds = Some(u)).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    uni.foreach { case (k, v) => assert(math.abs(ppr(k) - v) < 1e-15) }
  }

  test("personalized pagerank: out-of-universe seeds are excluded from " +
      "|S| (mass stays 1); a fully-invalid or empty seed set fails loudly") {
    // seed set {1, 99}: 99 is outside the universe — counting it would
    // make ps = 1/2 while 99's teleport mass lands nowhere (Σr = 1/2)
    val r = PageRank.pageRank(edges((1L, 2L)), iters = 4,
        nodes = Some(nodes(1L, 2L)),
        seeds = Some(nodes(1L, 99L)))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-12,
      s"total rank must stay 1 with a partially-invalid seed set: $r")
    intercept[IllegalArgumentException] {
      PageRank.pageRank(edges((1L, 2L)), iters = 2,
        nodes = Some(nodes(1L, 2L)), seeds = Some(nodes(99L)))
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(edges((1L, 2L)), iters = 2,
        nodes = Some(nodes(1L, 2L)),
        seeds = Some(nodes(1L).filter(col("id") < 0)))
    }
  }

  // ------------------------------------------------------ LabelProp

  private def triangle(a: Long, b: Long, c: Long) =
    Seq((a, b), (b, c), (c, a))

  test("lpa: two disjoint triangles collapse to their min-id labels") {
    val m = LabelProp.labelProp(
        edges(triangle(1L, 2L, 3L) ++ triangle(7L, 8L, 9L): _*), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L))
    assert(Seq(7L, 8L, 9L).forall(m(_) == 7L))
  }

  test("lpa: a single bridge edge does not merge two triangles " +
      "(majority beats the bridge vote)") {
    val m = LabelProp.labelProp(
        edges(triangle(1L, 2L, 3L) ++ triangle(7L, 8L, 9L) :+ (3L, 7L): _*),
        iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.filterKeys(_ <= 3).values.toSet.size == 1)
    assert(m.filterKeys(_ >= 7).values.toSet.size == 1)
    assert(m(1L) != m(7L), "bridged triangles must stay distinct")
  }

  test("lpa: isolated universe nodes keep their own id as community") {
    val m = LabelProp.labelProp(edges(triangle(1L, 2L, 3L): _*), iters = 3,
        nodes = Some(nodes(1L, 2L, 3L, 42L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(42L) == 42L)
  }

  test("lpa contract entry: a full partition of the doc universe, " +
      "sizes consistent") {
    val out = LabelProp.q105LabelProp(spark, sf0001).collect()
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(out.length == n)
    assert(out.map(_.getLong(0)).distinct.length == n)
    // csize is the true community size
    val byComm = out.groupBy(_.getLong(1))
    out.foreach(r => assert(r.getLong(2) == byComm(r.getLong(1)).length))
  }

  // ---------------------------------------------------------- KCore

  test("kcore: K4 plus a pendant chain — the clique is the 3-core, " +
      "chain peels away round by round") {
    // K4 on {1,2,3,4}; chain 4-5-6 hangs off it
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val m = KCore.kCore(edges(k4 ++ Seq((4L, 5L), (5L, 6L)): _*),
        k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2)))
      .toMap
    (1L to 4L).foreach(v => assert(m(v) == ((true, 3L)), s"node $v: $m"))
    Seq(5L, 6L).foreach(v => assert(m(v) == ((false, 0L))))
  }

  test("kcore: a triangle is a 2-core but not a 3-core") {
    val tri = edges((1L, 2L), (2L, 3L), (1L, 3L))
    val core2 = KCore.kCore(tri, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val core3 = KCore.kCore(tri, k = 3, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(core2.values.forall(identity))
    assert(core3.values.forall(!_))
  }

  test("kcore: cascade — removing one node's support unravels a chain " +
      "(needs the multi-round peel, not one degree filter)") {
    // square 1-2-3-4-1 with one diagonal 1-3: all degrees >= 2, but
    // 2-core is everything; at k=3 only... 1 and 3 have degree 3,
    // 2 and 4 degree 2 -> first peel drops {2,4}, second drops {1,3}
    // (their induced degree falls to 1): the 3-core is EMPTY, which a
    // single degree filter would get wrong (it would keep {1,3})
    val m = KCore.kCore(
        edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)),
        k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m.values.forall(!_), s"3-core must be empty: $m")
  }

  test("kcore contract entry: the peel reached its fixpoint within " +
      "the round budget at sf0.001") {
    val e = PageRank.citationEdges(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"))
    val at6 = KCore.kCore(e, 6, 6, nodes = Some(docs)).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sorted.toSeq
    val at7 = KCore.kCore(e, 6, 7, nodes = Some(docs)).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sorted.toSeq
    assert(at6 === at7, "one more round must not change the survivor set")
    assert(at6.exists(_._2) && at6.exists(!_._2),
      "the 6-core should be a proper nonempty subset on this graph")
  }

  // ------------------------------------------------------ Triangles

  test("triangles: K4 has 3 per node and lcc exactly 1") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val out = Triangles.triangleStats(edges(k4: _*)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    (0L to 3L).foreach { v =>
      assert(out(v) == ((3L, 3L, 1.0)))
    }
  }

  test("triangles approx: den=1 keeps every edge and reproduces the " +
      "exact global count; sampling is a deterministic edge subset") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val full = Triangles.triangleCountApprox(edges(k4: _*), den = 1)
      .collect()(0)
    assert(full.getLong(0) === 6L) // K4 edges
    assert(full.getLong(1) === 6L) // all sampled at p=1
    assert(full.getLong(2) === 4L) // K4's 4 triangles
    assert(full.getLong(3) === 4L) // ×1³
    // den=2 on the sf0.001 citation graph: the sampled set is a
    // deterministic hash subset (two runs identical), est = 8×sampled
    val e = PageRank.citationEdges(spark, sf0001)
    val a = Triangles.triangleCountApprox(e, den = 2).collect()(0)
    val b = Triangles.triangleCountApprox(e, den = 2).collect()(0)
    assert(a === b, "the coin is a pure function of the edge")
    assert(a.getLong(3) === a.getLong(2) * 8)
    assert(a.getLong(1) < a.getLong(0), "p=1/2 must drop edges")
    // unbiasedness is DOULION's theorem (E[est] = exact), not a
    // toy-scale assertion; the hard bound that IS checkable: sampled
    // triangles are a subset of the exact ones
    val exact = Triangles.triangleStats(e)
      .agg(sum("triangles")).collect()(0).getLong(0) / 3
    assert(a.getLong(2) <= exact,
      s"sampled ${a.getLong(2)} cannot exceed exact $exact")
  }

  test("triangles: a path has none; direction and parallel edges are " +
      "canonicalized away") {
    // path 1-2-3 plus the same edges reversed AND duplicated
    val out = Triangles.triangleStats(
        edges((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (2L, 3L)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3))).toMap
    assert(out(2L)._1 == 2L && out(2L)._2 == 0L)
    assert(out(1L) == ((1L, 0L, true))) // degree 1 -> lcc null
  }

  test("triangles: one triangle with a pendant vertex") {
    // triangle {1,2,3} + pendant 4 on 3: lcc(3) = 2*1/(3*2) = 1/3
    val out = Triangles.triangleStats(
        edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L) == ((3L, 1L)))
    assert(out(4L) == ((1L, 0L)))
    assert(out(1L) == ((2L, 1L)))
  }

  test("hits: isolated universe nodes carry exactly 0 in both scores") {
    val m = Hits.hits(edges((1L, 2L)), iters = 3,
        nodes = Some(nodes(1L, 2L, 9L)))
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(9L) == ((0.0, 0.0)))
    assert(math.abs(m(2L)._1 - 1.0) < 1e-12)
    assert(math.abs(m(1L)._2 - 1.0) < 1e-12)
  }

  test("family universe: a node whose only edges are self-loops still " +
      "appears in kCore and triangleStats output (r18 — the default " +
      "universe comes from RAW endpoints, like labelProp's)") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("src", "dst")
    val core = KCore.kCore(edges, k = 1, rounds = 2)
      .select("id").as[Long].collect().toSet
    assert(core === Set(1L, 2L, 3L, 5L),
      s"kCore universe must include the self-loop-only node: $core")
    val tri = Triangles.triangleStats(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tri.keySet === Set(1L, 2L, 3L, 5L) && tri(5L) === 0L,
      s"triangleStats must carry the self-loop-only node at zero: $tri")
    val lpa = LabelProp.labelProp(edges, iters = 2)
      .select("id").as[Long].collect().toSet
    assert(lpa === Set(1L, 2L, 3L, 5L))
  }

  test("labelProp accepts STRING node ids like the rest of the " +
      "family (r18 — the tie-break negates the count, not the label)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("d", "a"))
      .toDF("src", "dst")
    val out = LabelProp.labelProp(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet === Set("a", "b", "c", "d"))
    // the triangle a-b-c converges to the lexicographically smallest
    // label; d hangs off a and follows it
    assert(out.values.toSet === Set("a"), s"got $out")
  }
}
