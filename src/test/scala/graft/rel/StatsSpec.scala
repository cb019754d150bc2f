package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** χ² cells: independence gives exactly zero contributions, the
  * decomposition matches a hand-computed table, structural zero cells
  * are present and contribute their expected count, and the cell sum
  * reproduces the classic statistic.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly independent table: every contribution is exactly 0") {
    // P(a,x) = P(a)P(x) by construction: rows 2:1 across a/b, cols
    // 1:2 across x/y, all four cells filled proportionally
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(40)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val out = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .select("contrib").as[Double].collect()
    assert(out.length == 4 && out.forall(_ == 0.0))
  }

  test("hand-computed 2x2 decomposition, including the statistic") {
    // obs: (a,x)=10 (a,y)=20 (b,x)=30 (b,y)=40; N=100
    // e(a,x)=30*40/100=12, e(a,y)=30*60/100=18, e(b,x)=28, e(b,y)=42
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val cells = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(cells(("a", "x"))._4 == 12.0 && cells(("b", "y"))._4 == 42.0)
    val chi2 = cells.values.map(_._5).sum
    val want = math.pow(10 - 12, 2) / 12 + math.pow(20 - 18, 2) / 18 +
      math.pow(30 - 28, 2) / 28 + math.pow(40 - 42, 2) / 42
    assert(math.abs(chi2 - want) < 1e-12)
  }

  test("structural zero cells appear with contribution = expected") {
    // (b,x) never observed: the dense grid must still test it
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "y"))
    val cells = Stats.chi2Cells(rows.toDF("k", "v"), "k", "v")
      .as[(String, String, Long, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    assert(cells.size == 4)
    val zero = cells(("b", "x"))
    assert(zero._3 == 0L)
    // obs=0 → (0−e)²/e = e
    assert(zero._5 == zero._4)
  }

  test("contract query covers the full type x hour grid") {
    val out = Stats.q92Chi2Cells(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    val types = out.map(_._1).distinct.length
    val hours = out.map(_._2).distinct.length
    assert(out.length == types * hours, "grid must be dense")
    assert(out.forall(_._5 >= 0.0))
  }
}
