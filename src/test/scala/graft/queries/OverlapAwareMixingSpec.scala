package graft.queries

import graft.SparkSpec

/** c14's effective-mass inclusion–exclusion recounted from scratch (the
  * SourceOverlapSpec pattern): plain-Scala shingle sets on a PLANTED
  * 3-source fixture with engineered pairwise AND triple overlap — every
  * sketch complete, so the estimators run their exact branch and the
  * recount must match with equality — plus consistency of the full c14
  * relation against the oracle-checked d17/d18 outputs on sf0.001. */
class OverlapAwareMixingSpec extends SparkSpec {

  private def shinglesOf(text: String): Set[String] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (text.trim.isEmpty || w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  /** The full c14 relation computed with sets and Math.floorDiv — a
    * third implementation sharing no code with the query or the oracle. */
  private def expectedPlan(rows: Seq[(String, String)])
      : Seq[(String, Long, Long, Long, Long, Long, Long, Long)] = {
    val bySource: Map[String, Set[String]] = rows
      .filter { case (_, t) => t != null && t.nonEmpty }
      .groupBy(_._1)
      .map { case (src, rs) => src -> rs.iterator.flatMap(r => shinglesOf(r._2)).toSet }
    val srcs = bySource.keys.toSeq.sorted
    val raw = srcs.map { s =>
      val est = bySource(s).size.toLong
      val pairDisc = srcs.filter(_ != s)
        .map(t => (bySource(s) & bySource(t)).size.toLong).sum
      val tripleAdd = (for {
        t <- srcs; u <- srcs if t < u && t != s && u != s
      } yield (bySource(s) & bySource(t) & bySource(u)).size.toLong).sum
      val eff = math.max(est - pairDisc + tripleAdd, 0L)
      (s, est, pairDisc, tripleAdd, eff)
    }
    val budget = raw.map(_._5).sum / 2
    val target = budget / srcs.size
    raw.map { case (s, est, pd, ta, eff) =>
      val rate = if (eff == 0) 10000L
        else math.min(Math.floorDiv(target * 10000L, eff), 10000L)
      (s, est, pd, ta, eff, target, rate, Math.floorDiv(eff * rate, 10000L))
    }
  }

  private def runC14(dir: String): Seq[(String, Long, Long, Long, Long, Long, Long, Long)] =
    Curation.c14OverlapAwareMixing.fn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

  test("c14 equals the set recount on a planted 3-source overlap fixture") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c14-planted").toString
    // Engineered structure (sketches complete -> exact branch):
    //  - one document verbatim in ALL THREE sources (the triple overlap
    //    the pairwise-only discount would subtract twice)
    //  - one document shared by web & forum only (pure pairwise)
    //  - unique content per source, sized differently so the raw and
    //    effective plans disagree
    val docs = Seq(
      (0L, "terms of service boilerplate shared across every mirror site", "web"),
      (1L, "terms of service boilerplate shared across every mirror site", "forum"),
      (2L, "terms of service boilerplate shared across every mirror site", "wiki"),
      (3L, "breaking news syndicated article repeated on aggregator pages", "web"),
      (4L, "breaking news syndicated article repeated on aggregator pages", "forum"),
      (5L, "web exclusive reporting with original quotes and analysis today", "web"),
      (6L, "more web only coverage expanding the original reporting further", "web"),
      (7L, "forum users discuss their own niche hobby topics at length", "forum"),
      (8L, "encyclopedic prose curated by volunteer editors with citations", "wiki"),
      (9L, "a second wiki entry on an unrelated scholarly subject entirely", "wiki"),
      (10L, null.asInstanceOf[String], "wiki"),
      (11L, "two words", "web"))
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = expectedPlan(docs.map { case (_, t, src) => (src, t) })
    val got = runC14(dir)
    assert(got == want, s"planted c14 mismatch:\n got  $got\n want $want")

    // the engineered triple overlap is visible: every source's add-back
    // equals the shared-by-all-three shingle count (one doc, 7 shingles)
    val tripleShingles = shinglesOf(docs.head._2).size.toLong
    assert(got.forall(_._4 == tripleShingles),
      s"triple add-back should be $tripleShingles for all: $got")
    // and WITHOUT it the web/forum effective mass would double-discount:
    // pair_discount > est would floor at 0 for neither source here, but
    // eff + the add-back must exceed the pairwise-only value strictly
    assert(got.forall(g => g._5 == g._2 - g._3 + g._4))
  }

  test("c14 composes the oracle-checked d17/d18 estimates on sf0.001") {
    val dir = sf()
    // singles from d17's per-pair est_a/est_b (each source appears in
    // some pair at 20 sources), pair/triple sums from the two relations
    val d17 = TextOps.d17OverlapSketch.fn(spark, dir).collect()
    val d18 = TextOps.d18ThreeWayOverlap.fn(spark, dir).collect()
    val est = (d17.map(r => r.getString(0) -> r.getLong(3)) ++
      d17.map(r => r.getString(1) -> r.getLong(4))).toMap
    val pairDisc = d17.flatMap(r => Seq(
        r.getString(0) -> r.getLong(5), r.getString(1) -> r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tripleAdd = d18.flatMap(r => Seq(
        r.getString(0) -> r.getLong(5), r.getString(1) -> r.getLong(5),
        r.getString(2) -> r.getLong(5)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val got = runC14(dir)
    assert(got.nonEmpty)
    for ((src, estT, pd, ta, eff, _, _, _) <- got) {
      assert(estT == est(src), s"$src est: $estT vs d17 ${est(src)}")
      assert(pd == pairDisc.getOrElse(src, 0L), s"$src pair_discount")
      assert(ta == tripleAdd.getOrElse(src, 0L), s"$src triple_addback")
      assert(eff == math.max(estT - pd + ta, 0L), s"$src eff_mass")
    }
  }
}
