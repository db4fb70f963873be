package graft.queries

import graft.SparkSpec

/** c16's serving-model hand-off verified three ways: the emitted rows
  * recount from the family parameter relations under the ORACLE-CHECKED
  * c13 verdicts; threshold overrides genuinely flip WHICH parameters
  * ship (refreshed vs stored) exactly where the two parameter sets
  * differ; and the flattened shape is the serving-model contract
  * (every component present, every dimension contiguous). */
class RefreshExecutionSpec extends SparkSpec {

  private type Row6 = (String, Long, Long, Long, Long, String)

  private def rows(dir: String): Seq[Row6] =
    graft.SparkEntry.queries("c16_refresh_execution")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSeq

  /** The three family parameter relations flattened to c16's row shape
    * under an explicit verdict choice — the recount's expectation. */
  private def expected(dir: String, verdicts: Map[String, String]): Seq[Row6] = {
    def num(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue()
    def arr(r: org.apache.spark.sql.Row, c: String): Seq[Double] =
      r.getAs[scala.collection.Seq[Double]](c).toSeq
    val ivf = Similarity.s15RefreshedCentroids(spark, dir).collect().toSeq
      .flatMap { r =>
        val a = if (verdicts("ivf") == "refresh") arr(r, "cent") else arr(r, "cent_old")
        a.zipWithIndex.map { case (v, i) =>
          ("ivf", num(r, "list_id"), 0L, i.toLong, v.toLong, verdicts("ivf"))
        }
      }
    val pq = Similarity.s17RefreshedCodebooks(spark, dir).collect().toSeq
      .flatMap { r =>
        val a = if (verdicts("pq") == "refresh") arr(r, "cent") else arr(r, "cent_old")
        a.zipWithIndex.map { case (v, i) =>
          ("pq", num(r, "m"), num(r, "code"), i.toLong, v.toLong, verdicts("pq"))
        }
      }
    val sel = RefreshDecision.selectorWeights(
        Curation.dsirDriftCounts(spark, dir), Curation.DsirBuckets)
      .collect().toSeq
      .map { r =>
        val w = if (verdicts("selector") == "refresh") num(r, "w_new") else num(r, "w_old")
        ("selector", num(r, "b"), 0L, 0L, w, verdicts("selector"))
      }
    (ivf ++ pq ++ sel).sortBy(t => (t._1, t._2, t._3, t._4))
  }

  test("c16 rows ≡ the family parameter relations under c13's verdicts (sf0.001)") {
    val dir = sf()
    val verdicts = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(verdicts.keySet == Set("ivf", "pq", "selector"))
    val got = rows(dir)
    assert(got == expected(dir, verdicts),
      s"c16 recount divergence (first rows): got=${got.take(3)}")
    // verdict column consistent with c13 per family
    assert(got.groupBy(_._1).forall { case (f, rs) => rs.forall(_._6 == verdicts(f)) })
  }

  test("threshold overrides ship refreshed vs stored parameters exactly where they differ") {
    val dir = sf()
    def runWith(st: Long, ben: Long) =
      withRefreshThresholds(st, ben)(rows(dir))
    // every staleness/benefit clears a deeply-negative floor → all refresh;
    // nothing clears a huge one → all keep
    val allRefresh = runWith(-1000000L, -1000000L)
    val allKeep = runWith(1000000L, 1000000L)
    assert(allRefresh.nonEmpty && allRefresh.forall(_._6 == "refresh"))
    assert(allKeep.nonEmpty && allKeep.forall(_._6 == "keep"))
    val keyOf = (t: Row6) => (t._1, t._2, t._3, t._4)
    assert(allRefresh.map(keyOf).toSet == allKeep.map(keyOf).toSet,
      "the two verdict regimes must cover the identical component/dim keys")
    // rows whose value changed between the regimes == rows where the
    // refreshed parameter actually differs from the stored one
    val keepMap = allKeep.map(t => keyOf(t) -> t._5).toMap
    val changedKeys = allRefresh.filter(t => keepMap(keyOf(t)) != t._5).map(keyOf).toSet
    val vr = Map("ivf" -> "refresh", "pq" -> "refresh", "selector" -> "refresh")
    val vk = Map("ivf" -> "keep", "pq" -> "keep", "selector" -> "keep")
    val expKeep = expected(dir, vk).map(t => keyOf(t) -> t._5).toMap
    val expChanged = expected(dir, vr)
      .filter(t => expKeep(keyOf(t)) != t._5).map(keyOf).toSet
    assert(changedKeys == expChanged,
      s"selection wiring: ${changedKeys.size} changed vs ${expChanged.size} expected")
    // a refresh that ships identical bits would make the whole operator
    // vacuous — on the real corpus the warm start must move SOMETHING
    assert(expChanged.nonEmpty, "refreshed ≡ stored everywhere — vacuous fixture")
  }

  test("flattened shape is the serving-model contract") {
    val dir = sf()
    val got = rows(dir)
    val byFam = got.groupBy(_._1)
    // ivf: every cell ships all 64 dims, contiguous from 0
    val ivfByCell = byFam("ivf").groupBy(_._2)
    assert(ivfByCell.nonEmpty && ivfByCell.values.forall(
      rs => rs.map(_._4).sorted == (0L until 64L)))
    // pq: every stored codebook entry ships all PqD dims, contiguous
    // (codes the archive training left empty don't exist in the stored
    // model, so they don't ship — the key set IS the codebook's)
    val pqKeys = Similarity.s17RefreshedCodebooks(spark, dir).collect()
      .map(r => (r.getAs[Number]("m").longValue(), r.getAs[Number]("code").longValue()))
      .toSet
    val pqByEntry = byFam("pq").groupBy(t => (t._2, t._3))
    assert(pqByEntry.keySet == pqKeys && pqKeys.size >= Similarity.PqM)
    assert(pqByEntry.values.forall(
      rs => rs.map(_._4).sorted == (0L until Similarity.PqD.toLong)))
    // selector: one weight per observed bucket, dim 0
    val sel = byFam("selector")
    assert(sel.nonEmpty && sel.forall(t => t._3 == 0L && t._4 == 0L))
    assert(sel.map(_._2).distinct.size == sel.size)
    // globally ordered by (family, comp_a, comp_b, dim)
    assert(got == got.sortBy(t => (t._1, t._2, t._3, t._4)))
  }
}
