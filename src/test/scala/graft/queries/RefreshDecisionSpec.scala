package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** c13's decision arithmetic recounted from the ORACLE-CHECKED component
  * audits (ivf/pq staleness from s13/s14, ivf benefit from s15) and,
  * for the selector leg, from a full plain-Scala third implementation —
  * plus the threshold-override and boundary contracts of the shared
  * decision rule. */
class RefreshDecisionSpec extends SparkSpec {

  private def c13Rows(dir: String): Seq[(String, Long, Long, Long, Long, String)] =
    graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .toSeq

  test("c13 metrics recount from the audited components (sf0.001)") {
    val dir = sf()
    val rows = c13Rows(dir)
    assert(rows.map(_._1) == Seq("ivf", "pq", "selector"))

    // ivf: staleness from s13's oracle-checked per-cell relation,
    // benefit from s15's oracle-checked refresh report
    val s13 = graft.SparkEntry.queries("s13_index_staleness")(spark, dir).collect()
    val na = s13.map(_.getAs[Long]("n_arch")).sum
    val ni = s13.map(_.getAs[Long]("n_inc")).sum
    val ma = s13.map(_.getAs[Long]("d_arch")).sum
    val mi = s13.map(_.getAs[Long]("d_inc")).sum
    val ivfSt = 10000L * mi * na / (ma * ni) - 10000L
    val s15 = graft.SparkEntry.queries("s15_warmstart_refresh")(spark, dir).collect()
    val db = s15.map(_.getAs[Long]("d_before")).sum
    val da = s15.map(_.getAs[Long]("d_after")).sum
    val ivfBen = 10000L * (db - da) / db
    assert(rows(0)._2 == ivfSt, s"ivf staleness: got ${rows(0)._2} want $ivfSt")
    assert(rows(0)._3 == ivfBen, s"ivf benefit: got ${rows(0)._3} want $ivfBen")

    // pq: staleness from s14's oracle-checked per-subspace relation
    val s14 = graft.SparkEntry.queries("s14_pq_staleness")(spark, dir).collect()
    val pna = s14.map(_.getAs[Long]("n_arch")).sum
    val pni = s14.map(_.getAs[Long]("n_inc")).sum
    val pma = s14.map(_.getAs[Long]("err_arch")).sum
    val pmi = s14.map(_.getAs[Long]("err_inc")).sum
    val pqSt = 10000L * pmi * pna / (pma * pni) - 10000L
    assert(rows(1)._2 == pqSt, s"pq staleness: got ${rows(1)._2} want $pqSt")
    // pq benefit must remove SOME error mass (one warm k-means step on
    // this corpus) and never exceed 10⁴; its exact value is pinned by
    // the DuckDB oracle (the independent second implementation)
    assert(rows(1)._3 > 0 && rows(1)._3 < 10000, s"pq benefit: ${rows(1)._3}")

    // selector: FULL plain-Scala recount (tokens → charfold buckets →
    // TV distance + retrained-weight delta)
    val B = Curation.DsirBuckets
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
    val counts = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Long)].withDefaultValue((0L, 0L, 0L, 0L))
    for (r <- docs) {
      val inc = r.getLong(0) % 10 == 7
      val isT = r.getString(1) == Curation.DsirTarget
      for (t <- r.getString(2).trim.toLowerCase.split("\\s+")) {
        val b = graft.functions.CharFoldKernel.fold(UTF8String.fromString(t)) % B
        val (cta, cra, cti, nin) = counts(b)
        counts(b) =
          if (!inc && isT) (cta + 1, cra, cti, nin)
          else if (!inc) (cta, cra + 1, cti, nin)
          else if (isT) (cta, cra, cti + 1, nin)
          else (cta, cra, cti, nin + 1)
      }
    }
    val ntA = counts.values.map(_._1).sum
    val nrA = counts.values.map(_._2).sum
    val tiT = counts.values.map(_._3).sum
    val tiR = counts.values.map(_._4).sum
    val nb = counts.size.toLong
    val sh = counts.values.map { case (_, cra, _, nin) =>
      math.abs(nin * nrA - cra * tiR) }.sum
    val selSt = 10000L * sh / (2L * nrA * tiR)
    val dw = counts.values.map { case (cta, cra, cti, nin) =>
      val wOld = (cta + 1) * (nrA + B) * 10000L / ((cra + 1) * (ntA + B))
      val wNew = (cta + cti + 1) * (nrA + tiR + B) * 10000L /
        ((cra + nin + 1) * (ntA + tiT + B))
      math.abs(wNew - wOld)
    }.sum
    val selBen = dw / nb
    assert(rows(2)._2 == selSt, s"selector staleness: got ${rows(2)._2} want $selSt")
    assert(rows(2)._3 == selBen, s"selector benefit: got ${rows(2)._3} want $selBen")

    // every verdict obeys the rule at the default thresholds
    for ((f, st, ben, minSt, minBen, v) <- rows) {
      assert(minSt == RefreshDecision.DefaultMinStalenessBp &&
        minBen == RefreshDecision.DefaultMinBenefitBp)
      val want = if (st >= minSt && ben >= minBen) "refresh" else "keep"
      assert(v == want, s"$f: verdict $v, want $want (st=$st ben=$ben)")
    }
  }

  test("threshold confs flip the verdicts and ride in the output columns") {
    val dir = sf()
    def withConfs(st: Long, ben: Long)(body: => Unit): Unit = {
      spark.conf.set("spark.graft.refresh.minStalenessBp", st.toString)
      spark.conf.set("spark.graft.refresh.minBenefitBp", ben.toString)
      try body
      finally {
        spark.conf.unset("spark.graft.refresh.minStalenessBp")
        spark.conf.unset("spark.graft.refresh.minBenefitBp")
      }
    }
    withConfs(-1000000L, -1000000L) {
      val rows = c13Rows(dir)
      assert(rows.forall(_._6 == "refresh"), rows.mkString(", "))
      assert(rows.forall(r => r._4 == -1000000L && r._5 == -1000000L))
    }
    withConfs(1000000000L, 1000000000L) {
      assert(c13Rows(dir).forall(_._6 == "keep"))
    }
  }

  test("the decision rule is >= on BOTH axes (boundary contract)") {
    val s = spark
    import s.implicits._
    val legs = Seq(
      ("at", 250L, 100L), ("st_low", 249L, 100L), ("ben_low", 250L, 99L))
      .toDF("family", "staleness_bp", "benefit_bp")
    val got = RefreshDecision.decide(legs, 250L, 100L)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(got == Map("at" -> "refresh", "st_low" -> "keep", "ben_low" -> "keep"))
  }
}
