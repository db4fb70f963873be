package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the refresh-decision composition: folding the
  * triad monitors' report relations through
  * [[LiveRefreshDecision.decisionOf]] must reproduce the oracle-checked
  * `c13_refresh_decision` rows EXACTLY.  The ivf/pq inputs are the
  * batch audits' own per-cell/per-subspace relations (their live
  * reportOf parity is pinned by IndexStalenessParitySpec /
  * PqStalenessParitySpec); the SELECTOR leg is genuinely streamed —
  * the real incoming raw slice replays through
  * [[LiveSelectorStaleness.monitor]] and its keyed state feeds the
  * decision, so the test crosses the actual stream boundary once. */
class RefreshDecisionParitySpec extends SparkSpec {

  test("decisionOf over the triad reports == oracle-checked c13 (sf0.001)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf()
    val batch = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .toSeq
    assert(batch.map(_._1) == Seq("ivf", "pq", "selector"))
    // the stored benefit figures a deployment serves to the live rule
    // (the module doc's contract) — here, the batch pricing itself
    val ben = LiveRefreshDecision.StoredBenefits(
      batch(0)._3, batch(1)._3, batch(2)._3)

    val ivfPer = graft.SparkEntry.queries("s13_index_staleness")(spark, dir)
      .select(col("list_id"), col("n_arch"), col("n_inc"),
        col("d_arch"), col("d_inc"))
    val pqPer = graft.SparkEntry.queries("s14_pq_staleness")(spark, dir)
      .select(col("m"), col("n_arch"), col("n_inc"),
        col("err_arch"), col("err_inc"))

    // selector: REAL stream — replay the incoming raw slice through T20
    val docs = graft.tables.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "" &&
        col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
      .map(r => LiveSelectorStaleness.DocEv(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(docs.nonEmpty, "degenerate fixture: no incoming raw docs")
    val input = MemoryStream[LiveSelectorStaleness.DocEv]
    val q = LiveSelectorStaleness.monitor(input.toDS())
      .writeStream.format("memory").queryName("c13_parity")
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val selPer = LiveSelectorStaleness.driftCountsOf(
        spark.table("c13_parity").toDF(),
        graft.queries.Curation.dsirArchiveBucketStats(spark, dir))
      val live = LiveRefreshDecision.decisionOf(ivfPer, pqPer, selPer, ben)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getString(5)))
        .toSeq
      assert(live == batch,
        s"decision divergence:\n live=$live\n batch=$batch")
    } finally q.stop()
  }

  test("cold start (monitors booted, no incoming data) reads 'keep', never crashes") {
    // the live reportOf/driftCountsOf shapes COALESCE the incoming side
    // to true zeros; under ANSI an unguarded integer div by zero would
    // kill the decision query — no-evidence must be null staleness + keep
    val s = spark
    import s.implicits._
    val ivfPer = Seq((0, 10L, 0L, 100L, 0L))
      .toDF("list_id", "n_arch", "n_inc", "d_arch", "d_inc")
    val pqPer = Seq((0, 10L, 0L, 100L, 0L))
      .toDF("m", "n_arch", "n_inc", "err_arch", "err_inc")
    val selPer = Seq((1L, 3L, 5L, 0L)).toDF("b", "ct_arch", "cr_arch", "n_inc")
    val ben = LiveRefreshDecision.StoredBenefits(500L, 500L, 500L)
    val got = LiveRefreshDecision.decisionOf(ivfPer, pqPer, selPer, ben)
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(5)))
      .toSeq
    assert(got == Seq(("ivf", None, "keep"), ("pq", None, "keep"),
      ("selector", None, "keep")), got.mkString(", "))
  }

  test("threshold overrides flow through the live rule identically") {
    val s = spark
    import s.implicits._
    // report-shaped single-row inputs with known arithmetic:
    // staleness = 10000*mi*na div (ma*ni) - 10000
    val ivfPer = Seq((0, 10L, 10L, 100L, 150L))
      .toDF("list_id", "n_arch", "n_inc", "d_arch", "d_inc") // st = 5000
    val pqPer = Seq((0, 10L, 10L, 100L, 100L))
      .toDF("m", "n_arch", "n_inc", "err_arch", "err_inc") // st = 0
    val selPer = Seq((1L, 1L, 1L, 1L))
      .toDF("b", "ct_arch", "cr_arch", "n_inc") // single bucket: sh = 0
    val ben = LiveRefreshDecision.StoredBenefits(500L, 500L, 500L)
    val got = LiveRefreshDecision
      .decisionOf(ivfPer, pqPer, selPer, ben,
        minStalenessBp = 4000L, minBenefitBp = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(5))).toSeq
    assert(got == Seq(("ivf", 5000L, "refresh"), ("pq", 0L, "keep"),
      ("selector", 0L, "keep")), got.mkString(", "))
  }
}
