package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for next-epoch admission through the EXECUTED
  * selector (T23 — c17's streaming twin): feeding
  * [[LiveDsirScorer.monitor]] the SERVED weight export
  * ([[graft.queries.Curation.servingWeightExport]] — the verdict-picked
  * map plus its matching smoothing totals) and streaming the REAL
  * incoming raw slice must reproduce the oracle-checked
  * `c17_refreshed_selection` scoring exactly, per-source totals and
  * acceptance counts included.  T23 is deliberately T18's machinery
  * with a different loaded model — the deployment story of c16's
  * hand-off — so throughput and state shape are T18's soak row
  * verbatim; what this spec pins is that the EXPORT (weight pick +
  * totals pick) serves the same scores the batch operator admits by.
  * Both forced verdict regimes replay, so the export's totals-pick is
  * proven on each side (archive totals for "keep", full-pool totals
  * for "refresh"). */
class RefreshedScorerParitySpec extends SparkSpec {

  private def incoming(dir: String): Seq[LiveDsirScorer.DocEv] =
    graft.tables.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "" &&
        col("doc_id") % 10 === 7 &&
        col("source") =!= graft.queries.Curation.DsirTarget)
      .select("doc_id", "text", "source").collect()
      .map(r => LiveDsirScorer.DocEv(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  /** c17's scored relation rolled up per source — (n_docs, sum_score,
    * n_sel at the monitor's 10000 bp floor). */
  private def batchRollup(dir: String): Map[String, (Long, Long, Long)] =
    graft.queries.Curation.c17ScoredDocs(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(3)))
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> (rows.size.toLong, rows.map(_._2).sum,
          rows.count(_._2 >= 10000L).toLong)
      }

  private def liveTotals(dir: String): Map[String, (Long, Long, Long)] = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (_, wm, nt, nr) = graft.queries.Curation.servingWeightExport(spark, dir)
    val docs = incoming(dir)
    assert(docs.size >= 5, s"fixture too small: ${docs.size} incoming raw docs")
    val name = s"refreshed_scorer_parity_${System.nanoTime()}"
    val input = MemoryStream[LiveDsirScorer.DocEv]
    val q = LiveDsirScorer.monitor(input.toDS(), wm, nt, nr)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      // chunked: the per-source sums must fold across batches
      docs.grouped(docs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      spark.table(name)
        .groupBy(col("source"))
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(
            col("n_docs"), col("sum_score"), col("n_sel")), col("rev")).as("u"))
        .collect()
        .map(r => r.getString(0) -> (r.getStruct(1).getLong(0),
          r.getStruct(1).getLong(1), r.getStruct(1).getLong(2)))
        .toMap
    } finally q.stop()
  }

  test("live admission scoring under the served export == batch c17 (sf0.001)") {
    val dir = sf()
    assert(liveTotals(dir) == batchRollup(dir))
  }

  test("both forced regimes: the export picks the matching weights AND totals") {
    val dir = sf()
    for ((st, ben) <- Seq((-1000000L, -1000000L), (1000000L, 1000000L))) {
      withRefreshThresholds(st, ben) {
        val expect = batchRollup(dir)
        assert(liveTotals(dir) == expect,
          s"regime (st=$st, ben=$ben) diverged")
      }
    }
  }
}
