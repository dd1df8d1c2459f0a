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
    // Spark ships BloomFilterAggregate / BloomFilterMightContain as
    // INTERNAL expressions (the runtime-row-group-filter machinery behind
    // spark.sql.optimizer.runtime.bloomFilter) without a public SQL
    // surface. Registering them here gives the incremental-dedup operators
    // a codegen'd bloom build + probe with zero UDFs: `bloom_agg(xxhash64
    // (x), est_items, num_bits)` folds a partition-local sketch per task
    // and ORs them at the final aggregate (one bounded binary to the
    // driver); `bloom_contains(<binary literal>, xxhash64(x))` then
    // evaluates map-side inside whole-stage codegen.
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"bloom_agg expects 3 arguments, got ${args.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"bloom_contains expects 2 arguments, got ${args.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))
      }))
  }
}
