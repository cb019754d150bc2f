package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The fit recovers a planted exponent and flags non-Zipfian input. */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  /** A corpus whose word w_r appears exactly round(C/r^s) times. */
  private def planted(s: Double, nTypes: Int, c0: Int) = {
    val words = (1 to nTypes).flatMap { r =>
      val n = math.max(1, math.round(c0 / math.pow(r, s)).toInt)
      Seq.fill(n)(f"w$r%04d")
    }
    // shuffle deterministically so ranks are earned, not positional
    val mixed = words.zipWithIndex
      .sortBy { case (w, i) => (i * 2654435761L) % 100003 }
      .map(_._1)
    mixed.grouped(50).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
  }

  private def fitOf(df: org.apache.spark.sql.DataFrame): Row =
    Zipf.fit(df).collect().head

  test("recovers a planted exponent of ~1 with a tight fit") {
    val r = fitOf(planted(1.0, 200, 2000))
    val (s, r2) = (r.getDouble(3), r.getDouble(4))
    // rounding C/r^s to integer counts biases the deep tail slightly;
    // the head-dominated fit still lands on the planted exponent
    assert(math.abs(s - 1.0) < 0.1, s"exponent $s, expected ~1.0")
    assert(r2 > 0.98, s"r2 $r2, expected near-perfect fit")
  }

  test("distinguishes a steeper law and a uniform (non-Zipfian) corpus") {
    val steep = fitOf(planted(1.5, 200, 5000)).getDouble(3)
    assert(math.abs(steep - 1.5) < 0.15, s"steep exponent $steep")
    // uniform corpus: every word equally frequent → exponent ~0
    val uniform = (1 to 100).flatMap(r => Seq.fill(20)(f"u$r%03d"))
    val udf_ = uniform.grouped(50).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val u = fitOf(udf_)
    assert(math.abs(u.getDouble(3)) < 0.05,
      s"uniform exponent ${u.getDouble(3)}, expected ~0")
  }

  test("topK selection is the bounded heap aggregate, never a " +
      "vocabulary-wide window (plan guard)") {
    val df = graft.SparkEntry.queries("nq_zipf")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the r13 rewrite's property: the cut comes from top_k's map-side
    // partial (exchange ≤ (k+1)·partitions rows), not a single-task
    // row_number over every vocabulary type; the only Window ranks the
    // ≤ topK survivors of the heap
    assert(plan.contains("partial_top_k"),
      s"expected the heap aggregate's partial phase:\n$plan")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    wins.foreach { w =>
      // every window input must descend from the top_k explode, i.e.
      // contain the aggregate — not scan the raw counts relation
      assert(w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.toString.contains("top_k"))
            => a }.nonEmpty,
        s"a window ranks something other than the top_k survivors:\n$w")
    }
  }

  test("totals are exact and topK caps the ranks") {
    val df = planted(1.0, 50, 100)
    val full = fitOf(df)
    assert(full.getLong(0) == 50L) // n_types
    val toks = df.collect().map(_.getString(1).split("\\s+").length).sum
    assert(full.getLong(1) == toks.toLong) // n_tokens
    val capped = Zipf.fit(df, topK = 10).collect().head
    assert(capped.getLong(2) == 10L)
    assert(capped.getLong(0) == 50L)
  }
}
