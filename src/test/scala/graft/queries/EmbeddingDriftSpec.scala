package graft.queries

import graft.SparkSpec

/** s11's integer arithmetic pinned against a plain-Scala recount: the
  * floor(x·2²⁰) quantization, the parity split, the per-dimension
  * cross-multiplied mean gap, and the (shift desc, dim asc) top-5 — all
  * recomputed independently from the raw embeddings. */
class EmbeddingDriftSpec extends SparkSpec {

  test("s11 top-5 moved dimensions match a plain-Scala integer recount") {
    val dir = sf()
    val e = graft.tables.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    assert(e.length >= 10, s"fixture too small: ${e.length}")
    val dims = e.head._2.length
    val n0 = e.count(_._1 % 2 == 0).toLong
    val n1 = e.count(_._1 % 2 == 1).toLong
    val s0 = new Array[Long](dims); val s1 = new Array[Long](dims)
    e.foreach { case (id, v) =>
      val t = if (id % 2 == 0) s0 else s1
      var d = 0
      while (d < dims) { t(d) += math.floor(v(d) * 1048576.0).toLong; d += 1 }
    }
    val want = (0 until dims)
      .map(d => (d, n0, n1, s0(d), s1(d), math.abs(s1(d) * n0 - s0(d) * n1)))
      .sortBy(t => (-t._6, t._1)).take(5)

    val got = Similarity.s11EmbeddingDrift.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"\n got=$got\nwant=$want")
    assert(got.head._6 > 0, "no dimension moved at all — the statistic is vacuous here")
  }
}
