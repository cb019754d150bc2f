package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for cluster deployment: registers graft's custom
  * Catalyst expressions with every session via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * so SQL users get `vec_dot` without calling `VecFunctions.register`
  * programmatically. This is the idiomatic way a Spark-native library
  * ships Catalyst additions (functions today; a custom Rule/Strategy
  * would be injected from the same hook if an operator ever needs one).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[functions.FloatVecDot].getName, "vec_dot"),
      functions.VecFunctions.binary("vec_dot", functions.FloatVecDot)))
    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[functions.SortedIntersectCount].getName,
        "sorted_intersect_count"),
      functions.VecFunctions.binary("sorted_intersect_count",
        functions.SortedIntersectCount)))
    ext.injectFunction((
      new FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[functions.BoundedTopK].getName, "top_k"),
      functions.VecFunctions.binary("top_k",
        (c, k) => functions.BoundedTopK(c, k))))
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[functions.KmvSketch].getName, "kmv_sketch"),
      functions.VecFunctions.binary("kmv_sketch",
        (c, k) => functions.KmvSketch(c, k))))
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[functions.KllSketch].getName, "kll_sketch"),
      functions.VecFunctions.ternary("kll_sketch",
        (v, w, k) => functions.KllSketch(v, w, k))))
    ext.injectFunction((
      new FunctionIdentifier("sq8_dot"),
      new ExpressionInfo(classOf[functions.Sq8Dot].getName, "sq8_dot"),
      functions.VecFunctions.binary("sq8_dot", functions.Sq8Dot)))
  }
}
