package graft.queries

import graft.SparkSpec

/** s11's integer arithmetic pinned against a plain-Scala recount: the
  * floor(x·2²⁰) quantization, the parity split, the per-dimension
  * cross-multiplied mean gap with PER-DIMENSION denominators, and the
  * (shift desc, dim asc) top-5 — all recomputed independently from the
  * raw embeddings.  The second test plants the case the per-dim
  * denominators exist for: null embeddings (encoder failures) and a
  * ragged array must count toward exactly the dimensions they carry,
  * never deflate a mean they contributed nothing to. */
class EmbeddingDriftSpec extends SparkSpec {

  /** Independent recount with per-dimension counts. */
  private def recount(e: Seq[(Long, Option[Array[Double]])]): Seq[(Int, Long, Long, Long, Long, Long)] = {
    val dims = e.flatMap(_._2.map(_.length)).foldLeft(0)(math.max)
    val s0 = new Array[Long](dims); val s1 = new Array[Long](dims)
    val c0 = new Array[Long](dims); val c1 = new Array[Long](dims)
    e.foreach {
      case (id, Some(v)) =>
        val (s, c) = if (id % 2 == 0) (s0, c0) else (s1, c1)
        var d = 0
        while (d < v.length) {
          s(d) += math.floor(v(d) * 1048576.0).toLong; c(d) += 1; d += 1
        }
      case _ => ()
    }
    (0 until dims)
      .map(d => (d, c0(d), c1(d), s0(d), s1(d), math.abs(s1(d) * c0(d) - s0(d) * c1(d))))
      .sortBy(t => (-t._6, t._1)).take(5)
  }

  private def run(dir: String): Seq[(Int, Long, Long, Long, Long, Long)] =
    Similarity.s11EmbeddingDrift.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq

  test("s11 top-5 moved dimensions match a plain-Scala integer recount") {
    val dir = sf()
    val e = graft.tables.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        Option(r.getSeq[Float](1)).map(_.map(_.toDouble).toArray)))
      .toSeq
    assert(e.length >= 10, s"fixture too small: ${e.length}")
    val got = run(dir)
    assert(got == recount(e), s"\n got=$got\nwant=${recount(e)}")
    assert(got.head._6 > 0, "no dimension moved at all — the statistic is vacuous here")
  }

  test("null and ragged embeddings count only toward the dimensions they carry") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s11-ragged").toString
    // period 0: one full vector + one NULL (must not appear in ANY
    // denominator); period 1: one full vector + one RAGGED 2-dim vector
    // (must count in dims 0-1 only)
    val rows: Seq[(Long, Option[Seq[Float]])] = Seq(
      0L -> Some(Seq(1.0f, 2.0f, 3.0f)),
      2L -> None,
      1L -> Some(Seq(2.0f, 2.0f, 9.0f)),
      3L -> Some(Seq(4.0f, 0.0f)))
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = run(dir)
    val want = recount(rows.map { case (id, v) =>
      (id, v.map(_.map(_.toDouble).toArray))
    })
    assert(got == want, s"\n got=$got\nwant=$want")
    // the planted denominators: dim 0/1 see (c0, c1) = (1, 2); dim 2 sees (1, 1)
    val byDim = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byDim(0) == ((1L, 2L)) && byDim(2) == ((1L, 1L)),
      s"denominators did not follow the carried dimensions: $got")
  }

  /** Independent s12 recount: floor(x·2¹⁰) grid, squared, per-dim counts. */
  private def recountVar(e: Seq[(Long, Option[Array[Double]])]): Seq[(Int, Long, Long, Long, Long, Long)] = {
    val dims = e.flatMap(_._2.map(_.length)).foldLeft(0)(math.max)
    val s0 = new Array[Long](dims); val s1 = new Array[Long](dims)
    val c0 = new Array[Long](dims); val c1 = new Array[Long](dims)
    e.foreach {
      case (id, Some(v)) =>
        val (s, c) = if (id % 2 == 0) (s0, c0) else (s1, c1)
        var d = 0
        while (d < v.length) {
          val q = math.floor(v(d) * 1024.0).toLong
          s(d) += q * q; c(d) += 1; d += 1
        }
      case _ => ()
    }
    (0 until dims)
      .map(d => (d, c0(d), c1(d), s0(d), s1(d), math.abs(s1(d) * c0(d) - s0(d) * c1(d))))
      .sortBy(t => (-t._6, t._1)).take(5)
  }

  test("s12 top-5 spread-shifted dimensions match a plain-Scala integer recount") {
    val dir = sf()
    val e = graft.tables.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        Option(r.getSeq[Float](1)).map(_.map(_.toDouble).toArray)))
      .toSeq
    val got = Similarity.s12VarianceDrift.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == recountVar(e), s"\n got=$got\nwant=${recountVar(e)}")
  }

  test("s12 sees a pure spread shift that s11's mean gap cannot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s12-spread").toString
    // dim 0: period 0 = {-1, 1}, period 1 = {-2, 2} — means both exactly 0
    // (s11 gap 0 on the 2^20 grid: floor(-1·2^20) = -2^20 exactly, etc.),
    // second moment quadruples; dim 1 constant everywhere.
    Seq(
      (0L, Seq(-1.0f, 5.0f)), (2L, Seq(1.0f, 5.0f)),
      (1L, Seq(-2.0f, 5.0f)), (3L, Seq(2.0f, 5.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val s11 = Similarity.s11EmbeddingDrift.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(5)).toMap
    val s12 = Similarity.s12VarianceDrift.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(5)).toMap
    assert(s11(0) == 0L, s"mean gap should be exactly 0 on dim 0: $s11")
    // ss0 = 2·1024², ss1 = 2·2048², gap = |ss1·2 − ss0·2| = 4·(2048²−1024²)
    assert(s12(0) == 4L * (2048L * 2048L - 1024L * 1024L),
      s"spread gap wrong on dim 0: $s12")
    assert(s12(1) == 0L, s"constant dim must show zero spread gap: $s12")
  }

  test("a null ELEMENT inside a non-null embedding is out of every denominator") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s11-nullelem").toString
    // period 0: [1.0, NULL, 3.0] — dim 1's n0 must be 0, not 1 (the sum
    // never saw the element, so the count must not either); period 1: a
    // full vector so every dim has a non-degenerate other side
    Seq(
      (0L, Seq(Some(1.0f), None, Some(3.0f))),
      (1L, Seq(Some(2.0f), Some(2.0f), Some(9.0f))))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = run(dir)
    // hand recount on the floor(x·2^20) grid: q = x·1048576 exactly for
    // these float values
    def q(x: Double): Long = math.floor(x * 1048576.0).toLong
    val want = Seq(
      (0, 1L, 1L, q(1.0), q(2.0)),
      (1, 0L, 1L, 0L, q(2.0)),
      (2, 1L, 1L, q(3.0), q(9.0)))
      .map { case (d, n0, n1, s0, s1) => (d, n0, n1, s0, s1, math.abs(s1 * n0 - s0 * n1)) }
      .sortBy(t => (-t._6, t._1))
    assert(got == want, s"\n got=$got\nwant=$want")
  }
}
