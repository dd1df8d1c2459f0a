package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for embedding math.
  *
  * Why a custom `Expression` here and nowhere else in the engine: the
  * built-in higher-order functions (`aggregate(zip_with(...))`) express a
  * dot product correctly but evaluate interpreted — per element they walk
  * an expression tree and allocate a joined row, which dominates ANN
  * scoring where the dot product runs once per candidate pair. This
  * expression participates in whole-stage codegen as a tight primitive
  * loop over the two `ArrayData` buffers: no allocation, no boxing, no
  * per-element virtual calls. Preference order per the design notes:
  * compose built-ins where they're hot-path-adequate (everywhere else),
  * custom codegen'd Expression where they're not (here), UDF never.
  */
object VectorExpressions {

  /** `vec_dot(array<double>, array<double>) -> double`; shorter input ends
    * the loop (mirrors `zip_with` truncation semantics). Null input → null.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {

    // AbstractDataType is private[sql]; Seq[DataType] narrows covariantly
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }
}
