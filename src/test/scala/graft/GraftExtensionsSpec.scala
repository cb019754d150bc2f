package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook must give a fresh session `vec_dot` with no
  * programmatic registration — the cluster deployment contract.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers vec_dot") {
    // build a second SparkSession over the same SparkContext with the
    // extensions hook applied, the way spark.sql.extensions does on a
    // cluster; clear/restore the default so getOrCreate doesn't just
    // hand back the shared test session
    val base = TestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
        .newSession() // fresh state: must still see the injected function
      val row = s.sql(
        "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head()
      assert(row.getDouble(0) === 11.0)
      // and the injected AGGREGATE resolves + wraps in AggregateExpression
      val tk = s.sql(
        "SELECT g, top_k(v, 2) AS top FROM VALUES (1, 5L), (1, 9L), " +
          "(1, 7L), (2, 3L) AS t(g, v) GROUP BY g ORDER BY g").collect()
      assert(tk(0).getSeq[Long](1) === Seq(9L, 7L))
      assert(tk(1).getSeq[Long](1) === Seq(3L))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
