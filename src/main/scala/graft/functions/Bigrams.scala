package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel with a static forwarder so generated Java calls it directly.
  * Space-joined adjacent token pairs — element-for-element identical to
  * `transform(sequence(1, size(w)-1), i -> concat(w[i], ' ', w[i+1]))`
  * INCLUDING null semantics (a null token yields a null bigram), but ~20×
  * faster: Catalyst higher-order functions are excluded from whole-stage
  * codegen and pay an interpreted lambda eval per element, which made the
  * HOF form the single hottest spot of the t10 scan. */
object BigramKernel {
  private val Space = UTF8String.fromString(" ")
  def bigrams(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      if (!a.isNullAt(i) && !a.isNullAt(i + 1)) {
        out(i) = UTF8String.concat(a.getUTF8String(i), Space, a.getUTF8String(i + 1))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst bigram builder over an array<string> column (SURVEY
  * §7.3 tier-2: custom `Expression` with codegen before any UDF).
  * Registered as SQL function `graft_bigrams`. */
case class ArrayBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigrams requires array<string>, got $t")
  }
  override def prettyName: String = "graft_bigrams"

  override protected def nullSafeEval(a: Any): Any =
    BigramKernel.bigrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BigramKernel.bigrams($a);")

  override protected def withNewChildInternal(newChild: Expression): ArrayBigrams =
    copy(child = newChild)
}
