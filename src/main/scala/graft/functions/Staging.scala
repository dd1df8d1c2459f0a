package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan-staging helpers for expensive (higher-order-function) array
  * expressions feeding a Generate (explode/posexplode).
  *
  * The pitfall (measured, sf0.1 documents): the optimizer inlines a
  * single-referenced Project alias into the generator of a downstream
  * `explode`, and the generator expression is then re-evaluated PER OUTPUT
  * ELEMENT — an array built by an interpreted HOF chain (tokenize →
  * shingle → distinct) gets recomputed ~|array| times per row. Exploding
  * 5000 documents' bigram arrays: 11.1 s inlined vs 0.85 s with the array
  * staged as an attribute (13×).
  *
  * The fix: alias the array in its own projection, then reference the
  * attribute TWICE in the consuming expression (`pin` wraps it in
  * `when(size(arr) >= -1, arr)` — always true, including the null case,
  * since size(null) = -1). CollapseProject refuses to inline a non-cheap
  * alias referenced more than once, so the array materializes once per row
  * below the Generate.
  */
object Staging {

  /** Make an array attribute un-inlinable: the extra `size` reference keeps
    * the defining projection below the consumer. Semantics-preserving for
    * both explode and explode_outer (`size(null) = -1` keeps the predicate
    * true, and a NULL branch value behaves like the NULL array).
    */
  def pin(arr: Column): Column = when(size(arr) >= -1, arr)

  /** `df.select(keep..., explode(arrExpr))` with the array staged so the
    * generator reads an attribute (computed once per input row), never the
    * inlined expression (recomputed per output element).
    */
  def explodeStaged(df: DataFrame, keep: Seq[String], arrExpr: Column,
      as: String, outer: Boolean = false): DataFrame = {
    val staged = df.select(keep.map(col) :+ arrExpr.as("__arr"): _*)
    val gen = if (outer) explode_outer(pin(col("__arr"))) else explode(pin(col("__arr")))
    staged.select(keep.map(col) :+ gen.as(as): _*)
  }
}
