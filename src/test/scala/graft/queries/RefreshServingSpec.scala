package graft.queries

import graft.SparkSpec

/** s18's serve-through-the-executed-model verified three ways: the
  * verdict column agrees with the oracle-checked c13 IVF decision; the
  * served top-k recounts in plain Scala (quantize → argmin-assign →
  * probe → exact-cosine re-rank — a third implementation of the serving
  * step; the index derivation itself is recounted by the
  * PqRefresh/RefreshExecution specs); and threshold overrides genuinely
  * flip WHICH index answers (refreshed vs stored), with the served rows
  * matching the recount under the forced side in both regimes. */
class RefreshServingSpec extends SparkSpec {

  private type Served = (Long, Int, Long, Double, String)

  /** Catalyst Round parity (HALF_UP over the decimal string). */
  private def round4(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def served(dir: String): Seq[Served] =
    graft.SparkEntry.queries("s18_refreshed_serving")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))
      .toSeq

  /** Plain-Scala replay of the serving step under an explicit verdict:
    * floor-quantize to the s4 grid, integer-L2 argmin against the picked
    * index, probe the 3 nearest cells, exact-cosine top-5 within them —
    * the same arithmetic in a while-loop fold (graft_dot's order), so
    * doubles match bit for bit. */
  private def recount(dir: String, verdict: String): Seq[Served] = {
    val idx = Similarity.s15RefreshedCentroids(spark, dir).collect()
      .map { r =>
        val c = (if (verdict == "refresh") r.getAs[scala.collection.Seq[Double]]("cent")
                 else r.getAs[scala.collection.Seq[Double]]("cent_old")).toArray
        (r.getAs[Number]("list_id").intValue(), c, dot(c, c))
      }.sortBy(_._1).toSeq
    val rows = graft.tables.Tables.embeddings(spark, dir).collect()
      .map { r =>
        val e = r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray
        val qv = e.map(x => math.floor(x * 64))
        val vv = dot(qv, qv)
        val list = idx.map { case (l, c, cc) => (vv - 2 * dot(qv, c) + cc, l) }.min._2
        (r.getLong(0), e, qv, vv, list)
      }.toSeq
    val byList = rows.groupBy(_._5)
    rows.filter(_._1 < 5).flatMap { case (qid, qe, qqv, qvv, _) =>
      val qn = math.sqrt(dot(qe, qe))
      val probedCells = idx.map { case (l, c, cc) => (qvv - 2 * dot(qqv, c) + cc, l) }
        .sorted.take(3).map(_._2)
      probedCells.flatMap(l => byList.getOrElse(l, Seq.empty))
        .filter(_._1 != qid)
        .map { case (id, e, _, _, _) =>
          (id, round4(dot(qe, e) / (qn * math.sqrt(dot(e, e)))))
        }
        .sortBy { case (id, cos) => (-cos, id) }
        .take(5).zipWithIndex
        .map { case ((id, cos), i) => (qid, i + 1, id, cos, verdict) }
    }.sortBy(t => (t._1, t._2))
  }

  test("s18 serves through the index c13's verdict picked (sf0.001)") {
    val dir = sf()
    val ivfVerdict = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap.apply("ivf")
    val got = served(dir)
    assert(got.nonEmpty && got.forall(_._5 == ivfVerdict),
      s"s18 verdict column must equal c13's ivf verdict ($ivfVerdict)")
    assert(got == recount(dir, ivfVerdict),
      s"s18 recount divergence (first rows): got=${got.take(3)}")
    // serving contract: each query answers a full top-5
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    assert(byQ.values.forall(_.map(_._2).sorted == (1 to 5)))
  }

  test("threshold overrides flip WHICH index answers, recount matching both regimes") {
    val dir = sf()
    def runWith(st: Long, ben: Long) =
      withRefreshThresholds(st, ben)(served(dir))
    val refreshed = runWith(-1000000L, -1000000L)
    val kept = runWith(1000000L, 1000000L)
    assert(refreshed.nonEmpty && refreshed.forall(_._5 == "refresh"))
    assert(kept.nonEmpty && kept.forall(_._5 == "keep"))
    assert(refreshed == recount(dir, "refresh"))
    assert(kept == recount(dir, "keep"))
    // the two regimes must genuinely serve different indexes: on this
    // fixture the warm start moves centroids (RefreshExecutionSpec pins
    // that), so SOME query's answer set or ranking should move too — if
    // not, serving-through-the-decision would be unobservable here
    assert(refreshed.map(t => (t._1, t._2, t._3, t._4)) !=
        kept.map(t => (t._1, t._2, t._3, t._4)),
      "refreshed and stored indexes served identical rankings — vacuous fixture")
  }
}
