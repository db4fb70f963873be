package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** ONE-PASS banding + verify-state kernel for the live near-dup tier
  * (round 14, the T14 floor-raiser): from a TOKEN array, every
  * word-trigram shingle's [[CharFoldKernel]] base hash folds exactly
  * once — incrementally over the three tokens' bytes with the `' '`
  * separator, so the trigram STRING is never materialized — feeding
  * both outputs at once:
  *
  *   bands   all [[MinHashFamily.Bands]] LSH band values (the
  *           [[BandValuesKernel]] arithmetic, lane for lane)
  *   hashes  the SORTED DISTINCT h0 set (the
  *           `Dedup.shingleHashSetFor` relation)
  *
  * The Column-form pair this replaces on the streaming hot path
  * (`bandValuesFor` + `shingleHashSetFor`) evaluates the interpreted
  * `shingleArrayOf` higher-order chain TWICE per document and allocates
  * every trigram string; round-14 soak isolation showed that scan-side
  * chain — not state or verify arithmetic — capped the stage at ~3k
  * docs/s.  Arithmetic parity is pinned by BandHashesSpec (kernel ≡
  * both Column forms element-wise on corpus text and gnarly-whitespace
  * fixtures).
  *
  * Parity notes: duplicate shingles cannot move a min-lane, so banding
  * over ALL trigrams equals banding over the distinct set; the hash set
  * dedups by h0 exactly as `array_distinct(transform(…, charfold))`
  * does (distinct applied after hashing). */
object BandHashesKernel {
  import MinHashFamily.{Bands, NumHashes, P, RowsPerBand}

  private val hashAArr: Array[Long] = MinHashFamily.hashA.toArray
  private val hashBArr: Array[Long] = MinHashFamily.hashB.toArray
  private val bandCFlat: Array[Long] = MinHashFamily.bandC.flatten.toArray
  private val Prime = CharFoldKernel.Prime

  private def foldBytes(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xFF)) % Prime; i += 1 }
    h
  }

  /** Caller guards ≥ 3 tokens (as the Column forms' `size(w) >= 3`);
    * fewer yields empty outputs.  Null tokens are treated as absent
    * exactly like `concat_ws` drops them — a trigram window containing
    * a null folds only its non-null tokens and the separators between
    * them (the case never arises from `split` output; handled for
    * totality, not use). */
  def bandHashes(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val m = math.max(n - 2, 0)
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val h0s = new Array[Long](m)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    i = 0
    while (i < m) {
      // fold "t(i) t(i+1) t(i+2)" byte-wise from h=7, concat_ws semantics
      // (null tokens dropped, one separator between present tokens)
      var h = 7L
      var first = true
      var k = i
      while (k < i + 3) {
        if (bytes(k) != null) {
          if (!first) h = (h * 31 + 0x20L) % Prime
          h = foldBytes(h, bytes(k))
          first = false
        }
        k += 1
      }
      h0s(i) = h
      var j = 0
      while (j < NumHashes) {
        val hj = (h * hashAArr(j) + hashBArr(j)) % P
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    val bands = new Array[Any](Bands)
    if (m > 0) {
      var b = 0
      while (b < Bands) {
        var s = 0L
        var r = 0
        while (r < RowsPerBand) {
          s += mins(b * RowsPerBand + r) * bandCFlat(b * RowsPerBand + r)
          r += 1
        }
        bands(b) = s % P
        b += 1
      }
    }
    java.util.Arrays.sort(h0s)
    // in-place unique over the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || h0s(i) != h0s(w - 1)) { h0s(w) = h0s(i); w += 1 }
      i += 1
    }
    val row = new GenericInternalRow(2)
    row.update(0, new GenericArrayData(if (m > 0) bands else Array.empty[Any]))
    row.update(1, new GenericArrayData(java.util.Arrays.copyOf(h0s, w)))
    row
  }
}

/** Native Catalyst one-pass band-values + shingle-hash-set over an
  * array<string> TOKEN column.  Registered as SQL function
  * `graft_band_hashes`. */
case class BandHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bands", ArrayType(LongType, containsNull = true), nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_band_hashes requires array<string> tokens, got $t")
  }
  override def prettyName: String = "graft_band_hashes"

  override protected def nullSafeEval(tokens: Any): Any =
    BandHashesKernel.bandHashes(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.BandHashesKernel.bandHashes($s)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}
