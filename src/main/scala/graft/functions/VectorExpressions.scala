package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two ARRAY<DOUBLE> columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` — materializes an intermediate array per row
  * and evaluates lambda closures per element; on an all-pairs cosine
  * join that's the entire runtime. This expression generates a tight
  * primitive loop (no allocation, stays inside whole-stage codegen) —
  * ~20× faster on the q34 all-pairs scan.
  */
/** Bit-deterministic logistic sigmoid `1 / (1 + e^(−z))` over a DOUBLE.
  *
  * Spark's built-in `exp` codegens to `Math.exp`, whose HotSpot
  * intrinsic may differ by ULPs from the interpreted path
  * (`Math.exp` delegates to `StrictMath.exp` in source, but the JIT
  * substitutes a faster non-fdlibm kernel). A closure twin calling
  * `StrictMath.exp` therefore cannot be bit-equal the Catalyst arm.
  * This expression pins BOTH eval paths to `StrictMath.exp`, which
  * the JLS defines bit-exactly (fdlibm), so column-side and
  * closure-side scores agree to the last bit — the contract
  * [[graft.operators.QualityFilter]]'s batch/stream twins rely on.
  */
case class SigmoidD(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sigmoid_d needs a DOUBLE input, got $t")
    }

  override def nullSafeEval(z: Any): Any =
    java.lang.Double.valueOf(
      1.0 / (1.0 + java.lang.StrictMath.exp(-z.asInstanceOf[Double])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      z => s"1.0 / (1.0 + java.lang.StrictMath.exp(-($z)))")

  override protected def withNewChildInternal(
      newChild: Expression): SigmoidD = copy(child = newChild)
}

case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_d needs ARRAY<DOUBLE> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
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
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
