package graft.queries

import graft.SparkSpec

/** s19's ADC-through-the-executed-codebooks verified the same three ways
  * as s18 (RefreshServingSpec): verdict column ≡ c13's PQ decision; the
  * served top-k recounts in plain Scala (subvector split → argmin encode
  * → per-query distance table → integer ADC sum — the third
  * implementation); threshold overrides flip WHICH codebooks answer,
  * recount matching both regimes. */
class AdcServingSpec extends SparkSpec {

  private type Served = (Long, Int, Long, Long, String)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def served(dir: String): Seq[Served] =
    graft.SparkEntry.queries("s19_refreshed_adc")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSeq

  /** Plain-Scala ADC replay under an explicit verdict. */
  private def recount(dir: String, verdict: String): Seq[Served] = {
    val books = Similarity.s17RefreshedCodebooks(spark, dir).collect()
      .map { r =>
        val c = (if (verdict == "refresh") r.getAs[scala.collection.Seq[Double]]("cent")
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
        (r.getLong(0), qv)
      }.toSeq
    def subs(qv: Array[Double]): Seq[(Int, Array[Double], Double)] =
      (0 until Similarity.PqM).map { m =>
        val sv = qv.slice(m * Similarity.PqD, (m + 1) * Similarity.PqD)
        (m, sv, dot(sv, sv))
      }
    // corpus encoding: per (vec, m) the argmin code (ties → lowest code)
    val codesOf: Map[Long, Map[Int, Int]] = vecs.map { case (id, qv) =>
      id -> subs(qv).map { case (m, sv, svv) =>
        m -> byM(m).map { case (code, c, cc) =>
          (svv - 2 * dot(sv, c) + cc, code)
        }.min._2
      }.toMap
    }.toMap
    vecs.filter(_._1 < 5).flatMap { case (qid, qqv) =>
      // the query's distance table, then ADC = sum of lookups
      val dt: Map[(Int, Int), Double] = subs(qqv).flatMap { case (m, sv, svv) =>
        byM(m).map { case (code, c, cc) =>
          (m, code) -> (svv - 2 * dot(sv, c) + cc)
        }
      }.toMap
      vecs.filter(_._1 != qid).map { case (id, _) =>
        val adc = (0 until Similarity.PqM).map(m => dt((m, codesOf(id)(m)))).sum
        (id, adc.toLong)
      }
        .sortBy { case (id, adc) => (adc, id) }
        .take(5).zipWithIndex
        .map { case ((id, adc), i) => (qid, i + 1, id, adc, verdict) }
    }.sortBy(t => (t._1, t._2))
  }

  test("s19 serves ADC through the codebooks c13's verdict picked (sf0.001)") {
    val dir = sf()
    val pqVerdict = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap.apply("pq")
    val got = served(dir)
    assert(got.nonEmpty && got.forall(_._5 == pqVerdict),
      s"s19 verdict column must equal c13's pq verdict ($pqVerdict)")
    assert(got == recount(dir, pqVerdict),
      s"s19 recount divergence (first rows): got=${got.take(3)}")
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet)
    assert(byQ.values.forall(_.map(_._2).sorted == (1 to 5)))
  }

  test("threshold overrides flip WHICH codebooks answer, recount matching both regimes") {
    val dir = sf()
    def runWith(st: Long, ben: Long) =
      withRefreshThresholds(st, ben)(served(dir))
    val refreshed = runWith(-1000000L, -1000000L)
    val kept = runWith(1000000L, 1000000L)
    assert(refreshed.nonEmpty && refreshed.forall(_._5 == "refresh"))
    assert(kept.nonEmpty && kept.forall(_._5 == "keep"))
    assert(refreshed == recount(dir, "refresh"))
    assert(kept == recount(dir, "keep"))
  }
}
