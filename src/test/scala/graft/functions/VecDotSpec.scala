package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the codegen'd vec_dot expression beyond the operator suites
  * that use it: null-element rejection (session SQL can hand it anything)
  * and builder arity errors.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("null array elements are rejected, not silently read as zero") {
    // ArrayData.getFloat on a null slot returns 0.0f — without the guard
    // this query would return 8.0 (a phantom zero term) instead of failing
    val ex = intercept[Throwable] {
      spark.sql("SELECT vec_dot(" +
        "array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("null array element")), ex.toString)
  }

  test("containsNull=false columns keep the branch-free loop and correct math") {
    // build from range so the projection isn't constant-folded away —
    // a literal Seq collapses to LocalTableScan with nothing to codegen
    val df = spark.range(3)
      .select(expr("array(CAST(id AS FLOAT), CAST(id + 1 AS FLOAT))").as("a"),
        expr("array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))").as("b"))
      .select(expr("vec_dot(a, b)").as("d"))
    assert(df.as[Double].collect().toSeq == Seq(3.0, 8.0, 13.0))
    // still inside whole-stage codegen (the guard is schema-conditional,
    // not a per-row branch on these columns)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }

  test("wrong arity fails with a named arity error, not index-out-of-bounds") {
    val ex = intercept[Throwable] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))").head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("2 arguments") || m.contains("exactly 2")), ex.toString)
  }
}
