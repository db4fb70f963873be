package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** JVM kernel with a static forwarder so generated Java can call it
  * directly.  Sequential left fold in index order — arithmetic-identical
  * to `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` INCLUDING its null
  * semantics: `zip_with` null-pads a length mismatch and a null product
  * poisons the fold, so any mismatch or null element yields NULL (boxed
  * null here).  Swapping it into an oracle-checked query cannot change a
  * single bit of output. */
object DotKernel {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native Catalyst dot product over two array<double> columns (SURVEY §7.3
  * tier-2 preference: custom `Expression` with codegen before any UDF).
  * The Catalyst higher-order-function fold (`aggregate`+`zip_with`)
  * allocates a lambda frame per element; this emits one static call into a
  * primitive loop and stays inside whole-stage codegen — the difference is
  * the ANN hot path (|queries|·|corpus| dot products per scan).
  * Registered as SQL function `graft_dot` by
  * [[graft.sentiment.GraftFunctions]] and [[graft.GraftExtensions]]. */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got $l / $r")
    }
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}$$boxed = graft.functions.DotKernel.dot($a, $b);
      if (${ev.value}$$boxed == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}$$boxed.doubleValue();
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}
