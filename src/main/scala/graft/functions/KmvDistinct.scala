package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** K-minimum-values distinct-count sketch (Beyer et al., "On Synopses for
  * Distinct-Value Estimation under Multiset Operations", SIGMOD 2007 —
  * public literature) over pre-hashed non-negative int64 values assumed
  * ~uniform in `[0, m)`.
  *
  * The buffer keeps the k smallest DISTINCT hash values per group and
  * COMBINES MAP-SIDE (shuffle volume ≤ k longs per group per mapper —
  * the bounded-memory scale path for distinct counts, same contract as
  * HLL but with an integer-exact estimator). If fewer than k distinct
  * values were seen the sketch holds all of them and the count is exact;
  * otherwise the unbiased KMV estimator `(k−1)/U(k)` is evaluated in
  * EXACT integer arithmetic as `(k−1)·m div h_k` (`h_k` = k-th smallest
  * hash; `(k−1)·m < 2^63` for the mod-prime family in use). Because every
  * step — universal hash, k-th order statistic, integer division — is
  * plain int64 arithmetic, DuckDB replays the WHOLE estimate exactly,
  * which is what promotes a6 from a rows-only check to a full value
  * oracle (Spark's HLL-based `approx_count_distinct` is JVM-only).
  *
  * A `TypedImperativeAggregate` — SURVEY §7.3 tier-2: custom Catalyst
  * before UDAF/UDF. Plans as ObjectHashAggregate with a partial/final
  * split, like [[TopKAgg]].
  */
@ExpressionDescription(
  usage = "graft_kmv(hash, k, m) - KMV distinct estimate of hash values uniform in [0, m).")
case class KmvDistinct(
    child: Expression,
    kExpr: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr match {
    case Literal(v: Int, IntegerType) if v >= 2 => v
    case _ => throw new IllegalArgumentException(
      "graft_kmv requires an integer literal k >= 2")
  }
  private lazy val m: Long = mExpr match {
    case Literal(v: Long, LongType) if v > 0 => v
    case Literal(v: Int, IntegerType) if v > 0 => v.toLong
    case _ => throw new IllegalArgumentException(
      "graft_kmv requires a positive integer literal m (the hash range)")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (c, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv requires (bigint, int literal, int literal), got $c / $kk")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child, kExpr, mExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren(0), kExpr = newChildren(1), mExpr = newChildren(2))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    require(v >= 0 && v < m, s"graft_kmv hash out of range [0, $m): $v")
    if (buf.size < k) { buf.add(v): Unit }
    else if (v < buf.last() && buf.add(v)) { buf.pollLast(): Unit }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  /** Exact count below k; else `(k−1)·m div h_k` — all int64-exact.
    * `h_k ≥ k−1 ≥ 1` (k distinct non-negative longs), so never div-by-0. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (k - 1).toLong * m / buf.last()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
}
