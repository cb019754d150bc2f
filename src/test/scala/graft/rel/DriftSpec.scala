package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PSI behavior at the industry thresholds, with planted drift. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[Double]) = vs.toDF("value")

  // deterministic pseudo-uniform stream in [0, 1)
  private def u(seed: Int, n: Int): Seq[Double] =
    (1 to n).map(i => ((i.toLong * 2654435761L + seed) % 10007) / 10007.0)

  test("identical distributions score ~0; a mean shift scores > 0.25") {
    val ref = u(1, 4000)
    val same = Drift.psiBins(df(ref), df(u(2, 4000)), "value")
      .agg(sum("psi_term")).as[Double].head()
    assert(same < 0.01, s"no-drift PSI was $same")
    // shift current by +0.5: half the mass leaves the reference bins
    val shifted = Drift.psiBins(df(ref), df(u(2, 4000).map(_ + 0.5)), "value")
      .agg(sum("psi_term")).as[Double].head()
    assert(shifted > 0.25, s"planted-shift PSI was $shifted")
    assert(shifted > same * 10)
  }

  test("always exactly nBins rows; empty bins kept with the eps clamp " +
      "(finite terms, no NaN/Inf)") {
    // current mass entirely inside one reference bin → 9 empty bins
    val out = Drift.psiBins(df(u(1, 1000)),
      df(Seq.fill(500)(0.05)), "value").collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(0)).toSeq == (0 until 10))
    assert(out.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(out.map(_.getLong(2)).sum == 500L)
  }

  test("out-of-reference-range current values clamp into edge bins; " +
      "degenerate constant reference does not divide by zero") {
    val out = Drift.psiBins(df(u(1, 1000)),
      df(Seq(-5.0, 99.0)), "value").collect()
    assert(out.map(_.getLong(2)).sum == 2L)
    assert(out.head.getLong(2) == 1L && out.last.getLong(2) == 1L)
    val deg = Drift.psiBins(df(Seq(3.0, 3.0, 3.0)), df(Seq(3.0)), "value")
      .collect()
    assert(deg.length == 10 && deg.map(_.getLong(1)).sum == 3L)
    assert(deg.forall(r => !r.getDouble(3).isNaN))
  }

  test("an EMPTY current window reports maximal finite drift instead " +
      "of tripping ANSI division-by-zero") {
    val out = Drift.psiBins(df(u(1, 500)), df(Seq.empty[Double]), "value")
      .collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // every populated reference bin lost all its mass → large positive
    assert(out.map(_.getDouble(3)).sum > 1.0)
  }

  test("nulls are excluded on both sides") {
    val ref = Seq(Some(0.1), Some(0.9), None).toDF("value")
    val cur = Seq(Some(0.2), None, None).toDF("value")
    val out = Drift.psiBins(ref, cur, "value").collect()
    assert(out.map(_.getLong(1)).sum == 2L)
    assert(out.map(_.getLong(2)).sum == 1L)
  }
}
