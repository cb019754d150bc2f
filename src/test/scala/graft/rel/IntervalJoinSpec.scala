package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval-join semantics (SURVEY quirk Q1): half-open [start, end) —
  * a point exactly on a boundary matches exactly one segment; points
  * past the last boundary are dropped (inner-join semantics).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val segments = Seq(
    ("A", 0.0, 10.0), ("B", 10.0, 20.0), ("C", 20.0, 30.0)
  ).toDF("speaker", "start", "end")

  private def join(points: Seq[Double]) =
    points.toDF("t")
      .join(broadcast(segments), $"t" >= $"start" && $"t" < $"end")

  test("boundary point labels exactly once, to the opening segment") {
    val out = join(Seq(10.0)).select("speaker").as[String].collect()
    assert(out.toSeq == Seq("B"))
  }

  test("interior points label to their covering segment") {
    val out = join(Seq(0.0, 9.999, 15.0, 29.999))
      .orderBy("t").select("speaker").as[String].collect()
    assert(out.toSeq == Seq("A", "A", "B", "C"))
  }

  test("points past the last boundary are dropped") {
    assert(join(Seq(30.0, 99.0)).count() == 0)
  }

  test("every in-range point gets exactly one label") {
    val pts = (0 until 300).map(_ * 0.1)
    val out = join(pts)
    assert(out.count() == pts.count(p => p >= 0.0 && p < 30.0))
    assert(out.groupBy("t").count().filter($"count" > 1).count() == 0)
  }
}
