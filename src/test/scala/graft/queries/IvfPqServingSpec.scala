package graft.queries

import graft.SparkSpec

/** s20's composed IVF-ADC serving verified the s18/s19 way: both verdict
  * columns ≡ c13's per-family decisions (which may DIFFER — the recount
  * takes them independently); the served top-k recounts in plain Scala
  * (coarse assign → probe → candidates scoped to the probed cells →
  * integer ADC over codes — the third implementation); threshold
  * overrides flip BOTH families at once, recount matching both
  * regimes; and the coarse filter genuinely scopes the ADC (every
  * returned neighbor sits in one of its query's probed cells). */
class IvfPqServingSpec extends SparkSpec {

  private type Served = (Long, Int, Long, Long, String, String)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def served(dir: String): Seq[Served] =
    graft.SparkEntry.queries("s20_ivfpq_serving")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
      .toSeq

  /** Plain-Scala IVFPQ replay under explicit per-family verdicts. */
  private def recount(dir: String, ivfV: String, pqV: String): Seq[Served] = {
    val idx = Similarity.s15RefreshedCentroids(spark, dir).collect()
      .map { r =>
        val c = (if (ivfV == "refresh") r.getAs[scala.collection.Seq[Double]]("cent")
                 else r.getAs[scala.collection.Seq[Double]]("cent_old")).toArray
        (r.getAs[Number]("list_id").intValue(), c, dot(c, c))
      }.sortBy(_._1).toSeq
    val books = Similarity.s17RefreshedCodebooks(spark, dir).collect()
      .map { r =>
        val c = (if (pqV == "refresh") r.getAs[scala.collection.Seq[Double]]("cent")
                 else r.getAs[scala.collection.Seq[Double]]("cent_old")).toArray
        ((r.getAs[Number]("m").intValue(), r.getAs[Number]("code").intValue()),
          (c, dot(c, c)))
      }.toSeq
    val byM = books.groupBy(_._1._1).map { case (m, es) =>
      m -> es.map { case ((_, code), (c, cc)) => (code, c, cc) }.sortBy(_._1)
    }
    val vecs = graft.tables.Tables.embeddings(spark, dir).collect()
      .map { r =>
        val qv = r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 64)).toArray
        (r.getLong(0), qv, dot(qv, qv))
      }.toSeq
    def cellOf(qv: Array[Double], vv: Double): Int =
      idx.map { case (l, c, cc) => (vv - 2 * dot(qv, c) + cc, l) }.min._2
    def subs(qv: Array[Double]): Seq[(Int, Array[Double], Double)] =
      (0 until Similarity.PqM).map { m =>
        val sv = qv.slice(m * Similarity.PqD, (m + 1) * Similarity.PqD)
        (m, sv, dot(sv, sv))
      }
    val assigned = vecs.map { case (id, qv, vv) =>
      val codes = subs(qv).map { case (m, sv, svv) =>
        m -> byM(m).map { case (code, c, cc) =>
          (svv - 2 * dot(sv, c) + cc, code)
        }.min._2
      }.toMap
      (id, cellOf(qv, vv), codes)
    }
    val byCell = assigned.groupBy(_._2)
    vecs.filter(_._1 < 5).flatMap { case (qid, qqv, qvv) =>
      val probed = idx.map { case (l, c, cc) => (qvv - 2 * dot(qqv, c) + cc, l) }
        .sorted.take(3).map(_._2)
      val dt: Map[(Int, Int), Double] = subs(qqv).flatMap { case (m, sv, svv) =>
        byM(m).map { case (code, c, cc) =>
          (m, code) -> (svv - 2 * dot(sv, c) + cc)
        }
      }.toMap
      probed.flatMap(l => byCell.getOrElse(l, Seq.empty))
        .filter(_._1 != qid)
        .map { case (id, _, codes) =>
          (id, (0 until Similarity.PqM).map(m => dt((m, codes(m)))).sum.toLong)
        }
        .sortBy { case (id, adc) => (adc, id) }
        .take(5).zipWithIndex
        .map { case ((id, adc), i) => (qid, i + 1, id, adc, ivfV, pqV) }
    }.sortBy(t => (t._1, t._2))
  }

  test("s20 serves IVF-ADC through BOTH verdict-picked models (sf0.001)") {
    val dir = sf()
    val verdicts = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    val got = served(dir)
    assert(got.nonEmpty && got.forall(t =>
        t._5 == verdicts("ivf") && t._6 == verdicts("pq")),
      s"s20 verdict columns must equal c13's (ivf=${verdicts("ivf")}, pq=${verdicts("pq")})")
    assert(got == recount(dir, verdicts("ivf"), verdicts("pq")),
      s"s20 recount divergence (first rows): got=${got.take(3)}")
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    assert(byQ.values.forall(_.map(_._2).sorted == (1 to 5)))
  }

  test("the coarse filter genuinely scopes the ADC: s20 ⊆ probed cells, ⊆ s19's full-scan order") {
    val dir = sf()
    val verdicts = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    val got = served(dir)
    // s19 ranks the SAME ADC metric over ALL candidates — s20's rows
    // must carry identical adc values for the neighbors both return
    val full = graft.SparkEntry.queries("s19_refreshed_adc")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val overlap = got.filter(t => full.contains((t._1, t._3)))
    assert(overlap.nonEmpty, "no neighbor shared between s20 and s19 — implausible fixture")
    assert(overlap.forall(t => full((t._1, t._3)) == t._4),
      "shared neighbors must score the same ADC in the scoped and full-scan paths")
    // membership: every returned neighbor sits in a probed cell
    val rec = recount(dir, verdicts("ivf"), verdicts("pq"))
    assert(got == rec)
  }

  test("threshold overrides flip BOTH families, recount matching both regimes") {
    val dir = sf()
    def runWith(st: Long, ben: Long) =
      withRefreshThresholds(st, ben)(served(dir))
    val refreshed = runWith(-1000000L, -1000000L)
    val kept = runWith(1000000L, 1000000L)
    assert(refreshed.nonEmpty &&
      refreshed.forall(t => t._5 == "refresh" && t._6 == "refresh"))
    assert(kept.nonEmpty && kept.forall(t => t._5 == "keep" && t._6 == "keep"))
    assert(refreshed == recount(dir, "refresh", "refresh"))
    assert(kept == recount(dir, "keep", "keep"))
  }
}
