package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The K-minimum-values SKETCH itself — [[KmvDistinct]]'s buffer exposed
  * as a value: the k smallest DISTINCT hashes per group, sorted
  * ascending.  Where `graft_kmv` evaluates the sketch to its distinct
  * ESTIMATE, `graft_kmv_mins` returns the synopsis, which is what the
  * MULTISET estimators need (Beyer et al., SIGMOD 2007 §4: the k-mins
  * of A ∪ B are exactly the k smallest of mins(A) ∪ mins(B), and the
  * fraction of them present in both sketches estimates the Jaccard) —
  * d17's cross-source overlap runs entirely on these ≤ k-long arrays.
  *
  * Same bounded-memory contract as `graft_kmv`: the buffer COMBINES
  * MAP-SIDE, so the shuffle carries ≤ k longs per group per mapper no
  * matter the corpus — and every downstream step (sort, slice, set
  * intersection, integer division) is exact int64 arithmetic both
  * engines replay identically. */
@ExpressionDescription(
  usage = "graft_kmv_mins(hash, k, m) - the k smallest distinct hash values, sorted ascending.")
case class KmvMins(
    child: Expression,
    kExpr: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  // eval(), not a Literal pattern-match: checkInputDataTypes admits any
  // FOLDABLE k/m, and a foldable non-Literal (e.g. SQL `2+2`) only
  // becomes a Literal if ConstantFolding ran — evaluating the constant
  // expression directly keeps the contract optimizer-configuration-proof
  private lazy val k: Int = kExpr.eval() match {
    case v: Int if v >= 2 => v
    case v => throw new IllegalArgumentException(
      s"graft_kmv_mins requires a constant integer k >= 2, got $v")
  }
  private lazy val m: Long = mExpr.eval() match {
    case v: Long if v > 0 => v
    case v: Int if v > 0 => v.toLong
    case v => throw new IllegalArgumentException(
      s"graft_kmv_mins requires a constant positive integer m (the hash range), got $v")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, mExpr.dataType) match {
      // foldability is part of the analysis-time contract too: a k/m
      // COLUMN of the right type would otherwise pass here and throw the
      // lazy-val IllegalArgumentException on an executor (the round-12
      // failure class this check exists to close)
      case (LongType, IntegerType, IntegerType | LongType)
          if kExpr.foldable && mExpr.foldable =>
        // the constants are foldable, so their VALUES are analysis-time
        // facts too — range-check them here rather than letting the lazy
        // vals throw the first time offer() runs on an executor
        (kExpr.eval(), mExpr.eval()) match {
          case (kv: Int, _) if kv < 2 => TypeCheckResult.TypeCheckFailure(
            s"graft_kmv_mins requires constant k >= 2, got $kv")
          case (null, _) => TypeCheckResult.TypeCheckFailure(
            "graft_kmv_mins requires a non-null constant k")
          case (_, null) => TypeCheckResult.TypeCheckFailure(
            "graft_kmv_mins requires a non-null constant m")
          case (_, mv: Int) if mv <= 0 => TypeCheckResult.TypeCheckFailure(
            s"graft_kmv_mins requires constant m > 0 (the hash range), got $mv")
          case (_, mv: Long) if mv <= 0L => TypeCheckResult.TypeCheckFailure(
            s"graft_kmv_mins requires constant m > 0 (the hash range), got $mv")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (LongType, IntegerType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_kmv_mins requires LITERAL k and m arguments " +
            s"(got non-foldable: k foldable=${kExpr.foldable}, " +
            s"m foldable=${mExpr.foldable})")
      case (c, kk, mm) => TypeCheckResult.TypeCheckFailure(
        "graft_kmv_mins requires (bigint, int literal, int|bigint literal), " +
          s"got $c / $kk / $mm")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_mins"
  override def children: Seq[Expression] = Seq(child, kExpr, mExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMins =
    copy(child = newChildren(0), kExpr = newChildren(1), mExpr = newChildren(2))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    KmvMins.offer(buf, v, k, m)

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

  /** The TreeSet iterates ascending — the array is born sorted. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

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

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)
}

object KmvMins {
  /** THE KMV offer step — keep `v` iff the synopsis is not yet full or
    * `v` beats the current k-th smallest; distinctness rides the
    * TreeSet.  Shared by the batch aggregate above and the live
    * streaming fold ([[graft.stream.LiveOverlapSketch]]), so the
    * live ≡ batch sketch parity the stream module claims holds by
    * construction cannot be broken by editing one copy: both paths call
    * this, including the hash-range guard. */
  def offer(buf: java.util.TreeSet[java.lang.Long], v: Long, k: Int, m: Long): Unit = {
    require(v >= 0 && v < m, s"graft_kmv_mins hash out of range [0, $m): $v")
    if (buf.size < k) { buf.add(v): Unit }
    else if (v < buf.last() && buf.add(v)) { buf.pollLast(): Unit }
  }
}
