package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count-Min frequency sketch (Cormode & Muthukrishnan, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications", J.
  * Algorithms 2005 — public literature): `d` rows × `w` buckets of int64
  * counters; a key's frequency estimate is the MIN of its `d` bucket
  * counters — never an underestimate, overestimate bounded by
  * `ε·N` (ε = e/w) with probability `1 − (1/2)^d`.
  *
  * This aggregate is deliberately only the COUNTER kernel: the caller
  * supplies each row's `d` bucket indices as an int64 array computed with
  * ordinary codegen'd column arithmetic (the mod-prime universal-hash
  * family, same recipe as [[KmvDistinct]]/d3), and reads estimates back
  * with `element_at` over the finished sketch. Keeping the hash algebra
  * in the PLAN (not sealed inside the buffer) is what lets DuckDB replay
  * the whole sketch — bucket counts are a plain GROUP BY on the same
  * arithmetic — so consuming queries get a FULL value oracle, which no
  * JVM-seeded sketch (Spark's own `count_min_sketch` included) can offer.
  *
  * Scale contract: ONE pass over the data, constant `d·w` longs of state
  * per group, partial buffers COMBINE MAP-SIDE (elementwise add — the
  * sketch is a commutative monoid), so the shuffle carries one `d·w`
  * vector per mapper per group instead of the key universe. That is the
  * 100 TB path for frequency queries over unbounded key spaces where the
  * exact `a4`/`a5` groupBy would shuffle every distinct key.
  *
  * A `TypedImperativeAggregate` (SURVEY §7.3 tier-2, like [[TopKAgg]] /
  * [[KmvDistinct]]): plans as ObjectHashAggregate with a partial/final
  * split.
  */
@ExpressionDescription(
  usage = "graft_cms(buckets, w) - Count-Min sketch over per-row bucket-index arrays; " +
    "returns the d*w counter array (row-major).")
case class CountMinAgg(
    child: Expression,
    wExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val w: Int = wExpr match {
    case Literal(v: Int, IntegerType) if v >= 2 => v
    case _ => throw new IllegalArgumentException(
      "graft_cms requires an integer literal w >= 2 (buckets per row)")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case c => TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires (array<bigint> buckets, int literal w), got $c")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"
  override def children: Seq[Expression] = Seq(child, wExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), wExpr = newChildren(1))

  // d is data-driven (length of the first row's bucket array); the buffer
  // starts empty and is sized d*w on first contact so the literal list
  // stays (buckets, w) instead of forcing a redundant d.
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val b = if (buf.length == 0) new Array[Long](d * w) else buf
      require(b.length == d * w,
        s"graft_cms: inconsistent bucket-array length $d (sketch has ${b.length / w} rows)")
      var i = 0
      while (i < d) {
        val bkt = arr.getLong(i)
        require(bkt >= 0 && bkt < w, s"graft_cms bucket out of range [0, $w): $bkt")
        b(i * w + bkt.toInt) += 1L
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b2.length == 0) b1
    else if (b1.length == 0) b2
    else {
      require(b1.length == b2.length,
        s"graft_cms: merging sketches of different size ${b1.length} / ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
}
