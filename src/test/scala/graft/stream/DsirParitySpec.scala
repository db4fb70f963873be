package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the DSIR importance scorer — c11's streaming
  * twin ([[PqStalenessParitySpec]]'s discipline at the selection stage):
  * replaying the REAL raw pool through [[LiveDsirScorer.monitor]]
  * against the batch-trained weight export must reproduce the batch
  * per-source totals (doc counts, score mass, above-floor counts)
  * EXACTLY, chunked replay and checkpointed restart included. */
class DsirParitySpec extends SparkSpec {

  private val Floor = 10000L

  /** The batch side: per-source totals over c11's full scored raw pool
    * (the pre-top-k relation the query is a cut of). */
  private def batchRows(dir: String): Seq[(String, Long, Long, Long)] =
    graft.queries.Curation.dsirScoredDocs(spark, dir)
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("score_bp")).as("sum_score"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("score_bp") >= Floor, 1L)
            .otherwise(0L)).as("n_sel"))
      .select(col("source"), col("n_docs"),
        org.apache.spark.sql.functions.expr("sum_score div n_docs").as("mean_score_bp"),
        col("n_sel"))
      .orderBy(col("source"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def pool(dir: String): Seq[LiveDsirScorer.DocEv] =
    graft.tables.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "" &&
        col("source") =!= graft.queries.Curation.DsirTarget)
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
      .map(r => LiveDsirScorer.DocEv(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def reportRows(updates: org.apache.spark.sql.DataFrame) =
    LiveDsirScorer.reportOf(updates)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("replayed raw pool == batch per-source totals (sf0.001)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf()
    val (w, nt, nr) = graft.queries.Curation.dsirWeightExport(spark, dir)
    assert(w.nonEmpty && nt > 0 && nr > 0, "degenerate weight export")
    val docs = pool(dir)
    assert(docs.size >= 10, s"fixture too small: ${docs.size}")

    val input = MemoryStream[LiveDsirScorer.DocEv]
    val q = LiveDsirScorer.monitor(input.toDS(), w, nt, nr, Floor)
      .writeStream.format("memory").queryName("dsir_parity")
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val live = reportRows(spark.table("dsir_parity").toDF())
      val batch = batchRows(dir)
      assert(batch.nonEmpty, "degenerate fixture: batch totals empty")
      assert(live == batch, s"report divergence:\n live=$live\n batch=$batch")
    } finally q.stop()
  }

  test("per-source counters survive a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = sf()
    val (w, nt, nr) = graft.queries.Curation.dsirWeightExport(spark, dir)
    val docs = pool(dir)
    val (first, second) = docs.splitAt(docs.size / 2)

    val d = restartDirs("dsir")
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    def writeChunk(name: String, chunk: Seq[LiveDsirScorer.DocEv]): Unit =
      d.writeBatch(name, chunk.map(e =>
        s"""{"doc_id": ${e.doc_id}, "text": "${esc(e.text)}", "source": "${esc(e.source)}"}"""))
    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING")
        .json(d.in).as[LiveDsirScorer.DocEv]
      LiveDsirScorer.monitor(stream, w, nt, nr, Floor)
        .writeStream.format("json")
        .option("path", d.out).option("checkpointLocation", d.cp)
        .outputMode(OutputMode.Append).start()
    }
    writeChunk("b1.json", first)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeChunk("b2.json", second)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val updates = spark.read
      .schema("source STRING, rev LONG, n_docs LONG, sum_score LONG, n_sel LONG")
      .json(d.out)
    val live = reportRows(updates)
    val batch = batchRows(dir)
    assert(live == batch, s"restart divergence:\n live=$live\n batch=$batch")
    // sources present in both chunks advanced their rev chain across the
    // restart (the recovery actually resumed the fold)
    val bothChunks = first.map(_.source).toSet intersect second.map(_.source).toSet
    val revs = updates.groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.max(col("rev")).as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bothChunks.nonEmpty && bothChunks.forall(s => revs(s) >= 2L),
      "a source present in both chunks missed the post-recovery fold")
  }
}
