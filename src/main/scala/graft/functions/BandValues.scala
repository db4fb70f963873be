package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** JVM kernel with a static forwarder so generated Java calls it
  * directly: all [[MinHashFamily.Bands]] LSH band values of a distinct-
  * shingle array in ONE pass — per shingle, the [[CharFoldKernel]] base
  * hash folds ONCE and feeds all [[MinHashFamily.NumHashes]] min-hash
  * lanes.
  *
  * The equivalent Column form (16 separate
  * `array_min(transform(sh, charfold(sh)·a + b mod p))` expressions)
  * re-folds the base hash once PER LANE — Catalyst cannot
  * common-subexpression-eliminate across distinct lambda bodies — so
  * the scan-side banding (the streaming detector's per-event hot path)
  * paid 16× the hashing it needed.  Arithmetic is identical lane for
  * lane (`BandValuesSpec` pins kernel ≡ Column form element-wise, and
  * the LiveNearDupParitySpec band-key parity vs the batch aggregate
  * path holds transitively). */
object BandValuesKernel {
  import MinHashFamily.{Bands, NumHashes, P, RowsPerBand}

  // primitive copies of the family constants: the IndexedSeq forms box
  // every Long, and this loop runs 16 lookups per shingle on the
  // per-event streaming path — flat Array[Long] reads keep it unboxed
  private val hashAArr: Array[Long] = MinHashFamily.hashA.toArray
  private val hashBArr: Array[Long] = MinHashFamily.hashB.toArray
  private val bandCFlat: Array[Long] = MinHashFamily.bandC.flatten.toArray

  /** Null shingle elements are skipped (as `array_min` skips nulls); an
    * input with no non-null shingle yields all-null band values (what
    * the Column form's null propagation produced).  Callers guard
    * non-empty inputs — the null path exists for exactness, not use. */
  def bands(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        val h0 = CharFoldKernel.fold(shingles.getUTF8String(i))
        var j = 0
        while (j < NumHashes) {
          val h = (h0 * hashAArr(j) + hashBArr(j)) % P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](Bands)
    if (seen) {
      var b = 0
      while (b < Bands) {
        var s = 0L
        var r = 0
        while (r < RowsPerBand) {
          s += mins(b * RowsPerBand + r) * bandCFlat(b * RowsPerBand + r)
          r += 1
        }
        out(b) = s % P
        b += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst LSH band-values over an array<string> shingle column
  * (SURVEY §7.3 tier-2 preference: custom codegen'd `Expression` before
  * any UDF).  Registered as SQL function `graft_band_values`. */
case class BandValues(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_band_values requires array<string>, got $t")
  }
  override def prettyName: String = "graft_band_values"

  override protected def nullSafeEval(shingles: Any): Any =
    BandValuesKernel.bands(shingles.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.BandValuesKernel.bands($s)")

  override protected def withNewChildInternal(newChild: Expression): BandValues =
    copy(child = newChild)
}
