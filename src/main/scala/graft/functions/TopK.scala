package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Bounded top-k aggregate over a double column — the scale-correct
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
  * for per-group top-k: the window form SORTS every partition of the fact
  * table; this keeps a k-element min-heap per group and COMBINES
  * MAP-SIDE, so shuffle volume is k doubles per group per mapper instead
  * of the whole table.  Plans as ObjectHashAggregate with a partial/final
  * split (PlanAudit-asserted in q31).
  *
  * A `TypedImperativeAggregate` — SURVEY §7.3 tier-2: custom Catalyst
  * before UDAF/UDF.  Result is the values sorted descending (ties keep
  * duplicate values, so the output is deterministic regardless of which
  * tied ROW fed the heap), matching DuckDB's `max(x, k)` list aggregate
  * for the oracle.
  */
@ExpressionDescription(
  usage = "graft_topk(expr, k) - top k values of expr, sorted descending.")
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v > 0 => v
    case _ => throw new IllegalArgumentException(
      "graft_topk requires a positive integer literal k")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (c, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, int literal), got $c / $kk")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def offer(buf: java.util.PriorityQueue[java.lang.Double], d: Double): Unit =
    if (buf.size < k) { buf.add(d): Unit }
    else if (buf.peek() < d) { buf.poll(); buf.add(d): Unit }

  override def update(
      buf: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      b1: java.util.PriorityQueue[java.lang.Double],
      b2: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = arr.length - 1
    // heap pops ascending; fill from the back for a descending array
    val copy = new java.util.PriorityQueue[java.lang.Double](buf)
    while (i >= 0) { arr(i) = copy.poll(); i -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
}
