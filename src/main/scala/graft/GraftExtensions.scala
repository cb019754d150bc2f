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
  override def apply(ext: SparkSessionExtensions): Unit =
    // ONE registry shared with VecFunctions.register (r18 review) —
    // extension-configured and programmatic sessions cannot drift
    functions.VecFunctions.registry.foreach { case (name, cls, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
}
