package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the cross-source overlap sketch — d17's
  * streaming twin: replaying the REAL corpus through
  * [[LiveOverlapSketch.monitor]] must land per-source KMV sketches
  * identical to the batch `graft_kmv_mins` aggregate's (the k smallest
  * distinct hashes are a pure set property — any chunking or arrival
  * order folds to the same synopsis), and the report — which applies
  * d17's own shared estimator — must reproduce the oracle-checked
  * `d17_overlap_sketch` rows exactly, checkpointed restart included. */
class OverlapParitySpec extends SparkSpec {

  private def batchRows(dir: String): Seq[(String, String, Boolean, Long, Long, Long, Long)] =
    graft.SparkEntry.queries("d17_overlap_sketch")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

  private def corpus(dir: String): Seq[LiveOverlapSketch.DocEv] =
    graft.tables.Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), col("text"), col("source"))
      .collect()
      .map(r => LiveOverlapSketch.DocEv(r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq

  private def reportRows(updates: org.apache.spark.sql.DataFrame) =
    LiveOverlapSketch.reportOf(updates)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

  test("replayed corpus == oracle-checked d17 rows (sf0.001)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf()
    val docs = corpus(dir)
    assert(docs.size >= 10, s"fixture too small: ${docs.size}")

    val input = MemoryStream[LiveOverlapSketch.DocEv]
    val q = LiveOverlapSketch.monitor(input.toDS())
      .writeStream.format("memory").queryName("overlap_parity")
      .outputMode(OutputMode.Append).start()
    try {
      docs.grouped(docs.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val live = reportRows(spark.table("overlap_parity").toDF())
      val batch = batchRows(dir)
      assert(batch.nonEmpty, "degenerate fixture: batch report empty")
      assert(live == batch, s"report divergence:\n live=${live.take(4)}\n batch=${batch.take(4)}")
      // the SAME live state also serves d18's three-way report (the
      // pooled-mins theorem — no extra state): it must equal the
      // oracle-checked d18 rows exactly
      def optLong(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
        if (r.isNullAt(i)) None else Some(r.getLong(i))
      val live3 = LiveOverlapSketch
        .threeWayReportOf(spark.table("overlap_parity").toDF())
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3),
          r.getLong(4), r.getLong(5), r.getLong(6), optLong(r, 7)))
        .toSeq
      val batch3 = graft.SparkEntry.queries("d18_threeway_overlap")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3),
          r.getLong(4), r.getLong(5), r.getLong(6), optLong(r, 7)))
        .toSeq
      assert(batch3.nonEmpty && live3 == batch3,
        s"3-way divergence:\n live=${live3.take(3)}\n batch=${batch3.take(3)}")
      // ...and the SAME live state prices c14's overlap-aware mixing
      // plan (shared effective-mass + mixing arithmetic): it must equal
      // the oracle-checked c14 rows exactly — the consumption loop
      // closed in streaming
      def mixRows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .toSeq
      val liveMix = mixRows(LiveOverlapSketch
        .mixingPlanOf(spark.table("overlap_parity").toDF()))
      val batchMix = mixRows(
        graft.SparkEntry.queries("c14_overlap_aware_mixing")(spark, dir))
      assert(batchMix.nonEmpty && liveMix == batchMix,
        s"mixing-plan divergence:\n live=${liveMix.take(3)}\n batch=${batchMix.take(3)}")
    } finally q.stop()
  }

  test("sketch state survives a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dir = sf()
    val docs = corpus(dir)
    val (first, second) = docs.splitAt(docs.size / 2)

    val d = restartDirs("overlap")
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    def writeChunk(name: String, chunk: Seq[LiveOverlapSketch.DocEv]): Unit =
      d.writeBatch(name, chunk.map(e =>
        s"""{"doc_id": ${e.doc_id}, "text": "${esc(e.text)}", "source": "${esc(e.source)}"}"""))
    def start() = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, source STRING")
        .json(d.in).as[LiveOverlapSketch.DocEv]
      LiveOverlapSketch.monitor(stream)
        .writeStream.format("json")
        .option("path", d.out).option("checkpointLocation", d.cp)
        .outputMode(OutputMode.Append).start()
    }
    writeChunk("b1.json", first)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeChunk("b2.json", second)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val updates = spark.read
      .schema("source STRING, rev LONG, mins ARRAY<LONG>")
      .json(d.out)
    val live = reportRows(updates)
    val batch = batchRows(dir)
    assert(live == batch, s"restart divergence:\n live=${live.take(4)}\n batch=${batch.take(4)}")
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
