package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sorted_intersect_count must agree with size(array_intersect(..)) on
  * arbitrary sorted deduped inputs, and run inside whole-stage codegen.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.VecFunctions.register(spark)

  test("agrees with array_intersect on random sorted deduped arrays") {
    val rnd = new scala.util.Random(11)
    val cases = (0 until 40).map { _ =>
      // narrow value space → overlaps are common, intersections non-trivial
      def arr = Seq.fill(rnd.nextInt(40))(rnd.nextLong() % 100)
        .distinct.sorted
      val a = arr; val b = arr
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L))) :+ ((Seq(5L), Seq.empty[Long]))
    val rows = cases.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("merge"),
        size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Int, Int)].collect()
    rows.zip(cases).foreach { case ((m, b), (x, y)) =>
      assert(m === b, s"a=$x b=$y merge=$m builtin=$b")
    }
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // literal inputs constant-fold to a LocalTableScan; a range-driven
    // pipeline forces the expression through actual generated code
    val df = spark.range(4).select(
      sequence(lit(0L), col("id") + 2).as("a"),
      sequence(col("id"), col("id") + 3).as("b"))
      .select(expr("sorted_intersect_count(a, b)").as("c"))
    assert(df.as[Int].collect().toSeq === Seq(3, 3, 3, 3))
    // the "*(n)" operator prefix is the WholeStageCodegenExec marker in
    // the plan string; an interpreted fallback would print a bare Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }

  test("null array elements are rejected, not silently read as zero") {
    val ex = intercept[Throwable] {
      spark.sql("SELECT sorted_intersect_count(" +
        "array(CAST(NULL AS BIGINT)), array(CAST(0 AS BIGINT)))").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null array element")), ex.toString)
  }

  test("empty and disjoint inputs count zero") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq.empty[Long]),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)))
      .toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)").as("c"))
    assert(df.as[Int].collect().toSeq === Seq(0, 0, 0))
  }
}
