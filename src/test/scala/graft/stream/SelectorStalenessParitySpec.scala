package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the selector-staleness monitor — c12's
  * streaming twin: replaying the REAL incoming raw slice (doc_id % 10
  * = 7, the batch convention) through [[LiveSelectorStaleness.monitor]]
  * against the stored archive bucket stats must reproduce the
  * oracle-checked `c12_selector_staleness` report EXACTLY, chunked
  * replay and checkpointed restart included. */
class SelectorStalenessParitySpec extends SparkSpec {

  private def batchRows(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    graft.SparkEntry.queries("c12_selector_staleness")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private def incoming(dir: String): Seq[LiveSelectorStaleness.DocEv] =
    graft.tables.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "" &&
        col("doc_id") % 10 === 7)
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
      .map(r => LiveSelectorStaleness.DocEv(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def reportRows(updates: org.apache.spark.sql.DataFrame,
      archiveStats: org.apache.spark.sql.DataFrame) =
    LiveSelectorStaleness.reportOf(updates, archiveStats)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  test("replayed incoming slice == oracle-checked c12 report (sf0.001)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf()
    val archiveStats = graft.queries.Curation.dsirArchiveBucketStats(spark, dir)
    val docs = incoming(dir)
    assert(docs.nonEmpty, "degenerate fixture: no incoming raw docs")

    val input = MemoryStream[LiveSelectorStaleness.DocEv]
    val q = LiveSelectorStaleness.monitor(input.toDS())
      .writeStream.format("memory").queryName("c12_parity")
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val live = reportRows(spark.table("c12_parity").toDF(), archiveStats)
      val batch = batchRows(dir)
      assert(batch.nonEmpty, "degenerate fixture: batch report empty")
      assert(live == batch, s"report divergence:\n live=${live.take(4)}\n batch=${batch.take(4)}")
    } finally q.stop()
  }

  test("bucket counters survive a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = sf()
    val archiveStats = graft.queries.Curation.dsirArchiveBucketStats(spark, dir)
    val docs = incoming(dir)
    val (first, second) = docs.splitAt(docs.size / 2)
    assert(first.nonEmpty && second.nonEmpty, "fixture too small to split")

    val d = restartDirs("c12stale")
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    def writeChunk(name: String, chunk: Seq[LiveSelectorStaleness.DocEv]): Unit =
      d.writeBatch(name, chunk.map(e =>
        s"""{"doc_id": ${e.doc_id}, "text": "${esc(e.text)}", "source": "${esc(e.source)}"}"""))
    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING")
        .json(d.in).as[LiveSelectorStaleness.DocEv]
      LiveSelectorStaleness.monitor(stream)
        .writeStream.format("json")
        .option("path", d.out).option("checkpointLocation", d.cp)
        .outputMode(OutputMode.Append).start()
    }
    writeChunk("b1.json", first)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeChunk("b2.json", second)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val updates = spark.read
      .schema("b LONG, rev LONG, n_inc LONG")
      .json(d.out)
    val live = reportRows(updates, archiveStats)
    val batch = batchRows(dir)
    assert(live == batch, s"restart divergence:\n live=${live.take(4)}\n batch=${batch.take(4)}")
    // buckets hit by both chunks advanced their rev chain across the
    // restart (the recovery actually resumed the fold)
    val b1 = first.flatMap(e => LiveSelectorStaleness.tokenBuckets(e.text)).toSet
    val b2 = second.flatMap(e => LiveSelectorStaleness.tokenBuckets(e.text)).toSet
    val both = b1 intersect b2
    val revs = updates.groupBy(col("b"))
      .agg(org.apache.spark.sql.functions.max(col("rev")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(both.nonEmpty && both.forall(b => revs(b) >= 2L),
      "a bucket hit in both chunks missed the post-recovery fold")
  }
}
