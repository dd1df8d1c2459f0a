package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions

/** Engine extensions, activated with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (Engine,
  * Verify, Bench, and the test session all set it). Registers the native
  * vector expressions so they're callable through the public
  * `functions.call_function("vec_dot", ...)` / SQL `vec_dot(a, b)` surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(VectorExpressions.DotProduct.getClass.getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        VectorExpressions.DotProduct(args(0), args(1))
      }))
  }
}
