package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Divide, EqualTo, Expression, ExpressionInfo, If, Literal, Multiply, Sqrt}

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
    // vec_cosine(a, b) = dot(a,b) / (|a|*|b|) — a composed Catalyst tree
    // over the codegen'd DotProduct, not a UDF, so the whole similarity
    // score stays inside whole-stage codegen. Mirrors `Similarity.cosine`
    // exactly: zero-norm input → 0.0, NULL input → NULL (the If's null
    // predicate falls through to the divide, which propagates the NULL;
    // the divide-by-zero branch is unreachable because denom = 0 takes the
    // true branch first).
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(VectorExpressions.DotProduct.getClass.getName, "vec_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_cosine expects 2 arguments, got ${args.length}")
        val (a, b) = (args(0), args(1))
        val denom = new Multiply(
          Sqrt(VectorExpressions.DotProduct(a, a)),
          Sqrt(VectorExpressions.DotProduct(b, b)))
        If(EqualTo(denom, Literal(0.0)),
          Literal(0.0),
          new Divide(VectorExpressions.DotProduct(a, b), denom))
      }))
  }
}
