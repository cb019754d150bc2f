package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Property-based invariants (SURVEY §5.2): interval-join totality and
  * uniqueness under half-open semantics, cumsum monotonicity, dedup
  * idempotence, label encode∘decode identity. Trials are capped low —
  * each trial runs Spark jobs.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val durGen = Gen.listOfN(5, Gen.choose(1, 20)) // segment lengths

  property("interval join: every in-range point labeled exactly once") =
    forAll(durGen, Gen.listOfN(40, Gen.choose(0.0, 120.0))) { (durs, pts) =>
      val bounds = durs.scanLeft(0.0)(_ + _)
      val segs = bounds.zip(bounds.tail).zipWithIndex
        .map { case ((s, e), i) => (s"seg$i", s, e) }
        .toDF("name", "start", "end")
      val total = bounds.last
      val out = pts.toDF("t")
        .join(broadcast(segs), $"t" >= $"start" && $"t" < $"end")
      val expected = pts.count(p => p >= 0.0 && p < total)
      out.count() == expected &&
        out.groupBy("t").count().filter($"count" > 1).count() == 0
    }

  property("window cumsum is monotone for non-negative inputs") =
    forAll(Gen.listOfN(30, Gen.choose(0.0, 100.0))) { xs =>
      val w = Window.orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = xs.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("i", "v")
        .withColumn("c", sum("v").over(w))
        .orderBy("i").select("c").as[Double].collect()
      cum.sliding(2).forall {
        case Array(a, b) => b >= a - 1e-9
        case _ => true
      }
    }

  property("dropDuplicates is idempotent and minimal") =
    forAll(Gen.listOfN(50, Gen.choose(0, 10))) { keys =>
      val df = keys.toDF("k")
      val once = df.dropDuplicates("k")
      once.count() == keys.distinct.length &&
        once.dropDuplicates("k").count() == once.count()
    }

  property("label encode then decode is identity") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("Male", "Female", "Other"))) { labels =>
      val df = labels.toDF("speaker")
      val indexer = new org.apache.spark.ml.feature.StringIndexer()
        .setInputCol("speaker").setOutputCol("label")
        .setStringOrderType("alphabetAsc").fit(df)
      val decoded = new org.apache.spark.ml.feature.IndexToString()
        .setInputCol("label").setOutputCol("back")
        .setLabels(indexer.labelsArray(0))
        .transform(indexer.transform(df))
      decoded.filter($"speaker" =!= $"back").count() == 0
    }

  property("seeded sample is deterministic (reference quirk Q6 discipline)") =
    forAll(Gen.choose(1L, 1000L)) { seed =>
      val df = (0 until 500).toDF("i")
      val a = df.sample(0.2, seed).as[Int].collect().toSeq
      val b = df.sample(0.2, seed).as[Int].collect().toSeq
      a == b
    }

  property("md5 fingerprint dedup groups exactly equal texts") =
    forAll(Gen.listOfN(30, Gen.oneOf("aa", "bb", "cc", "dd"))) { texts =>
      val df = texts.toDF("text")
      val groups = df.groupBy(md5($"text")).count().collect()
      groups.length == texts.distinct.length &&
        groups.map(_.getLong(1)).sum == texts.length
    }

  // random graphs vs a reference union-find: the DataFrame min-label
  // propagation must produce exactly the same components
  private val edgeGen = for {
    n <- Gen.choose(2, 16)
    m <- Gen.choose(0, 20)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield (n.toLong, edges.filter(e => e._1 != e._2))

  property("connected components equal reference union-find on random graphs") =
    forAll(edgeGen) { case (n, edges) =>
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // reference label = min node id in component
      val want = (0 until n.toInt).groupBy(find).flatMap { case (_, ns) =>
        val mn = ns.min.toLong; ns.map(_.toLong -> mn)
      }
      val nodes = (0L until n).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("d1", "d2")
        else edges.toDF("d1", "d2")
      val got = graft.text.DedupClusters.connectedComponents(nodes, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }
}
