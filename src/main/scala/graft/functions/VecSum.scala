package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise vector sum over an `array<double>` column — the k-means
  * update step's aggregate, as ONE expression.
  *
  * Why it exists (r17): the integer-mean centroid update used to be
  * `posexplode → groupBy(key, pos) → groupBy(key) collect_list` (two
  * exchanges and a dim× row blow-up feeding the first), and the obvious
  * one-exchange rewrite — `dim` separate `sum(vec[i])` aggregates —
  * measurably REGRESSED the composition queries: 65 aggregate
  * expressions + a 64-element array projection, replicated across every
  * copy of the (heavily shared) audit subtrees, inflated Catalyst
  * analysis/optimization time past what the removed exchange saved.
  * This aggregate keeps the one-exchange shape at ~3 plan expressions:
  * `groupBy(key).agg(graft_vec_sum(vec), count(1))` then one
  * `transform` over the ≤ k result rows.
  *
  * Exactness: inputs are floor-quantized grid integers; integer sums in
  * doubles are exact (≪ 2⁵³) and ADDITION ORDER CANNOT CHANGE THE
  * VALUE, so the merge order of partial buffers is immaterial — the
  * aggregate replays bit-for-bit against DuckDB's per-position
  * `sum(qv[i])`.  Null elements contribute nothing (the old form's
  * `sum` skipped them); a RAGGED group (mismatched vector lengths)
  * fails loudly rather than mis-summing — the engine's
  * correct-by-crash convention.  Map-side partial aggregation ships one
  * ≤ dim-double buffer per group per mapper — the shuffle never carries
  * corpus rows. */
@ExpressionDescription(
  usage = "graft_vec_sum(vec) - element-wise sum of array<double> values per group.")
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum requires array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_vec_sum"
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren(0))

  /** Zero-length = "no vector seen yet" (first update sizes it). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length == 0) new Array[Double](n) else buf
    require(acc.length == n,
      s"graft_vec_sum: ragged vector lengths in one group (${acc.length} vs $n)")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += arr.getDouble(i)
      i += 1
    }
    acc
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b2.length == 0) return b1
    if (b1.length == 0) return b2
    require(b1.length == b2.length,
      s"graft_vec_sum: ragged vector lengths across partitions (${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
}
