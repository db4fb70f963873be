package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** JVM kernel with a static forwarder so generated Java can call it
  * directly (the [[DotKernel]] pattern).  Computes the nearest-centroid
  * argmin of one point against a packed centroid set in a single pass:
  *
  *   d_j = Σᵢ qv[i]² − 2·Σᵢ qv[i]·flat[j·dim+i] + ccs[j]
  *
  * returning the (id, d) pair minimal under (d, id) — EXACTLY the
  * `min_by(struct(id, d), struct(d, id))` the broadcast-argmin aggregate
  * form computed, including the id tie-break, so swapping it into an
  * oracle-checked assignment pass cannot change a bit of output.  The
  * qv·qv term is re-derived in-kernel from the same qv the relation's
  * `vv = graft_dot(qv, qv)` column was built from (integer-grid values:
  * both are exact, hence equal).
  *
  * Null/ragged handling mirrors [[DotKernel]]'s poisoning: an empty
  * centroid set, a flat array whose length isn't k·dim, or any null
  * element yields NULL (callers drop such rows, which is exactly the
  * zero-rows-out behaviour the old crossJoin-with-empty form had). */
object NearestKernel {
  def nearest(qv: ArrayData, ids: ArrayData, flat: ArrayData,
      ccs: ArrayData): InternalRow = {
    val k = ids.numElements()
    val dim = qv.numElements()
    if (k == 0 || flat.numElements() != k.toLong * dim || ccs.numElements() != k)
      return null
    var qq = 0.0
    var i = 0
    while (i < dim) {
      if (qv.isNullAt(i)) return null
      val v = qv.getDouble(i)
      qq += v * v
      i += 1
    }
    var bestId = 0
    var bestD = 0.0
    var first = true
    var j = 0
    while (j < k) {
      if (ids.isNullAt(j) || ccs.isNullAt(j)) return null
      var s = 0.0
      val off = j * dim
      var t = 0
      while (t < dim) {
        if (flat.isNullAt(off + t)) return null
        s += qv.getDouble(t) * flat.getDouble(off + t)
        t += 1
      }
      val d = qq - 2.0 * s + ccs.getDouble(j)
      val id = ids.getInt(j)
      if (first || d < bestD || (d == bestD && id < bestId)) {
        bestD = d; bestId = id; first = false
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestD))
  }
}

/** Native codegen'd map-side nearest-centroid assignment
  * (`graft_nearest(qv, ids, flat, ccs)` → `struct<id int, d double>`):
  * replaces the `crossJoin(broadcast(cents)) → groupBy(point) argmin`
  * shape, whose groupBy re-shuffles the ENTIRE corpus (one row per
  * point, qv payload and all) to finish an argmin that was already
  * complete map-side — the candidate rows of a point all live in the
  * task that produced them (guide §2.4: remove shuffles outright).
  * With the centroid set packed into one broadcast row (`ids` parallel
  * to `ccs`, `flat` = the k centroid vectors concatenated), the
  * assignment is a pure projection: zero exchanges, one static call
  * into a primitive loop inside whole-stage codegen (the
  * [[ArrayDotProduct]] tier-2 rule — a `transform`+`array_min` HOF form
  * would pay an interpreted lambda frame per centroid per row, the
  * documented ~20× tax on the |corpus|·k hot path). */
case class NearestCentroid(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("d", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _),
          ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "graft_nearest requires (array<double>, array<int>, array<double>, " +
          s"array<double>), got $a / $b / $c / $d")
    }
  override def prettyName: String = "graft_nearest"

  override protected def nullSafeEval(qv: Any, ids: Any, flat: Any, ccs: Any): Any =
    NearestKernel.nearest(qv.asInstanceOf[ArrayData], ids.asInstanceOf[ArrayData],
      flat.asInstanceOf[ArrayData], ccs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qv, ids, flat, ccs) => s"""
      ${ev.value} = graft.functions.NearestKernel.nearest($qv, $ids, $flat, $ccs);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): NearestCentroid =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
