package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel with a static forwarder so generated Java calls it directly.
  * Polynomial string hash over BYTES, mod 1e9+7 — `h ← (h·31 + byte) % p`
  * from h=7, the same int64-safe recipe as the m2 decode fold: every
  * intermediate fits a signed 64-bit value, so DuckDB replays it
  * exactly via `list_reduce` over `ascii(substr(...))` (corpus text is
  * pure ASCII at every SF, so bytes == code points).  This is what lets
  * the MinHash pipeline (d3) carry a full value oracle: Spark's xxhash64
  * is not expressible in SQL, a universal mod-prime family is. */
object CharFoldKernel {
  val Prime = 1000000007L
  def fold(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 7L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xFF)) % Prime; i += 1 }
    h
  }

  /** THE DuckDB replay of [[fold]] over a SQL string expression `e` —
    * the shared oracle snippet every charfold-consuming oracle (d3/d17/
    * c11/c12/…) interpolates instead of restating.
    *
    * ASCII-ONLY ASSUMPTION, on purpose: [[fold]] hashes UTF-8 BYTES
    * while this SQL folds `ascii(substr(e, i, 1))` — Unicode CODE
    * POINTS.  The two agree exactly when every character is ≤ U+007F
    * (one byte == its code point), which holds for the driver corpora
    * at every SF (`TESTDATA.md` — pure-ASCII text columns) and is why
    * the charfold pipelines can carry full value oracles at all.  On
    * non-ASCII input the ORACLE diverges, not the engine: a deployment
    * validating against DuckDB on non-ASCII corpora must swap this
    * snippet for a byte-wise fold over `encode(e)`.  Keeping the
    * documented code-point form is deliberate — it is dialect-portable
    * and byte-indexing a BLOB is not ANSI. */
  def sqlOf(e: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
            list_transform(range(1, length($e) + 1),
              i -> CAST(ascii(substr($e, CAST(i AS INT), 1)) AS BIGINT))),
            (acc, x) -> (acc * 31 + x) % $Prime)"""
}

/** Native Catalyst mod-prime char fold over a string column.
  * Registered as SQL function `graft_charfold`. */
case class CharFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_charfold requires string, got $t")
  }
  override def prettyName: String = "graft_charfold"

  override protected def nullSafeEval(s: Any): Any =
    CharFoldKernel.fold(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharFoldKernel.fold($s)")

  override protected def withNewChildInternal(newChild: Expression): CharFold =
    copy(child = newChild)
}
