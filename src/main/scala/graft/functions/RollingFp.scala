package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** JVM kernel (static forwarder for codegen) for the t7 rolling
  * (polynomial / Rabin–Karp-style) fingerprint: fold
  * acc = (acc·31 + len·131 + first·7 + last) mod 1e9+7 over the token
  * stream — arithmetic identical to the `list_reduce` the DuckDB oracle
  * runs AND to the tier-1 Scala UDF it replaces (operations on
  * `String`, so char semantics are unchanged). */
object RollingFpKernel {
  def fp(tokens: ArrayData): Long = {
    var acc = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val u = tokens.getUTF8String(i)
      val t = if (u == null) "" else u.toString
      if (t.nonEmpty) {
        val v = t.length.toLong * 131L + t.charAt(0).toLong * 7L +
          t.charAt(t.length - 1).toLong
        acc = (acc * 31L + v) % 1000000007L
      } else acc = (acc * 31L) % 1000000007L
      i += 1
    }
    acc
  }
}

/** Native Catalyst form of the rolling fingerprint (tier-2 preference:
  * codegen'd `Expression` over a Scala UDF — no encoder boundary, the
  * enclosing projection stays in one whole-stage-codegen span).
  * Registered as SQL function `graft_rolling_fp`. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_fp requires array<string>, got $t")
    }
  override def prettyName: String = "graft_rolling_fp"

  override protected def nullSafeEval(tokens: Any): Any =
    RollingFpKernel.fp(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RollingFpKernel.fp($t)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
