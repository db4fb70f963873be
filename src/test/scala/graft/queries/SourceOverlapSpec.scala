package graft.queries

import graft.SparkSpec

/** Independent plain-Scala recount of d16's cross-source overlap matrix
  * (the PqStalenessSpec pattern): shingle every document with a local
  * loop (no Spark expressions, no shared helpers), build the per-source
  * distinct-shingle sets, intersect every pair, and require the
  * distributed query to agree cell-for-cell — on a PLANTED multi-source
  * fixture whose overlaps are known by construction, and on the real
  * sf0.001 corpus.  The DuckDB oracle already pins values cross-engine;
  * this pins them against a third, loop-written implementation.
  *
  * Reference intent: the per-source breakdowns of
  * `dashboard/streamlit_app.py` ask the within-source question; d16 asks
  * the cross-source one a corpus-mixing pipeline needs.
  */
class SourceOverlapSpec extends SparkSpec {

  /** Word-trigram distinct shingles of one text — the local replay of
    * `shingleArrayOf` written as a loop. */
  private def shinglesOf(text: String): Set[String] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (text.trim.isEmpty || w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  /** The expected matrix from raw (source, text) rows: for every source
    * pair (a < b) with a non-empty intersection, (shared, |a|, |b|,
    * 10000*shared div (|a|+|b|-shared)). */
  private def expectedMatrix(rows: Seq[(String, String)])
      : Seq[(String, String, Long, Long, Long, Long)] = {
    val bySource: Map[String, Set[String]] = rows
      .filter { case (_, t) => t != null && t.nonEmpty }
      .groupBy(_._1)
      .map { case (src, rs) => src -> rs.iterator.flatMap(r => shinglesOf(r._2)).toSet }
    val srcs = bySource.keys.toSeq.sorted
    for {
      a <- srcs; b <- srcs if a < b
      shared = (bySource(a) & bySource(b)).size.toLong if shared > 0
    } yield {
      val na = bySource(a).size.toLong
      val nb = bySource(b).size.toLong
      (a, b, shared, na, nb, Math.floorDiv(10000L * shared, na + nb - shared))
    }
  }

  private def runD16(dir: String): Seq[(String, String, Long, Long, Long, Long)] =
    TextOps.d16SourceOverlap.fn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

  test("d16 equals the local recount on a planted 4-source fixture") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d16-planted").toString
    // Four sources with engineered overlap structure:
    //  - web & forum share one full document verbatim (high overlap)
    //  - web & wiki share only a 3-word phrase window (exactly 1 shingle)
    //  - mail shares nothing with anyone (must NOT appear in the matrix)
    //  - a null-text and a 2-word row exercise the filters
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "web"),
      (1L, "shared boilerplate all rights reserved footer text", "web"),
      (2L, "shared boilerplate all rights reserved footer text", "forum"),
      (3L, "forum only content with its own distinct wording here", "forum"),
      (4L, "an article about the quick brown painting technique", "wiki"),
      (5L, "wiki prose continues with unrelated material entirely", "wiki"),
      (6L, "completely disjoint correspondence nobody else repeats", "mail"),
      (7L, null.asInstanceOf[String], "mail"),
      (8L, "two words", "mail"))
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = expectedMatrix(docs.map { case (_, t, src) => (src, t) })
    val got = runD16(dir)
    assert(got == want.sortBy(p => (p._1, p._2)),
      s"planted matrix mismatch:\n got  $got\n want $want")

    // structural sanity the fixture was built to plant
    val cells = got.map(r => (r._1, r._2) -> r).toMap
    assert(cells.contains(("forum", "web")), "verbatim-shared doc must co-occur")
    assert(cells(("web", "wiki"))._3 == 1L,
      "web/wiki share exactly the one 'the quick brown' shingle")
    assert(!got.exists(r => r._1 == "mail" || r._2 == "mail"),
      "a source sharing zero shingles must not emit matrix rows")
  }

  test("d16 equals the local recount on the sf0.001 corpus") {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = expectedMatrix(raw).sortBy(p => (p._1, p._2))
    val got = runD16(sf())
    assert(want.nonEmpty, "sf0.001 must actually contain cross-source overlap")
    assert(got == want, s"sf0.001 matrix mismatch: got ${got.size} rows, want ${want.size}")
  }
}
