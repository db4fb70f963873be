package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the conversion funnel — q21's streaming twin
  * joins the parity family (T10↔a8, T10b↔a9, T12↔a10, T13↔a13,
  * T14↔d3/d14, T6↔q15): the REAL events table replayed through
  * [[LiveFunnel.monitor]] must reproduce the oracle-checked batch
  * `q21_funnel` exactly — per-user earliest-stage triples first (the
  * state), then the one-row summary through [[LiveFunnel.summaryOf]]
  * (q21's own flag arithmetic).  Replay is CHUNKED so mins must fold
  * across batches, and the restart test re-derives a mid-stream
  * checkpoint recovery: a purchase arriving only after recovery can
  * complete a funnel whose view/click live in restored state. */
class FunnelParitySpec extends SparkSpec {

  private def batchPerUser(dir: String): Set[(Long, Option[Long], Option[Long], Option[Long])] = {
    import org.apache.spark.sql.functions._
    graft.tables.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_purchase"))
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
  }

  test("replayed events == batch q21: per-user triples AND the summary (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf("sf0.01")
    val events = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[LiveFunnel.FEv].collect().toSeq
    assert(events.size >= 5000, s"fixture too small: ${events.size}")

    val input = MemoryStream[LiveFunnel.FEv]
    val q = LiveFunnel.monitor(input.toDS())
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // chunked replay: per-user mins must FOLD across batches
      events.grouped(events.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val updates = spark.table("funnel_parity")
      // state parity: the latest record per user == batch conditional mins
      val live = updates
        .groupBy(col("user_id"))
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(
            col("t_view"), col("t_click"), col("t_purchase")), col("rev")).as("u"))
        .collect()
        .map { r =>
          val u = r.getStruct(1)
          (r.getLong(0),
            if (u.isNullAt(0)) None else Some(u.getLong(0)),
            if (u.isNullAt(1)) None else Some(u.getLong(1)),
            if (u.isNullAt(2)) None else Some(u.getLong(2)))
        }.toSet
      val batch = batchPerUser(dir)
      assert(batch.size >= 100, s"degenerate fixture: ${batch.size} users")
      assert(live == batch,
        s"per-user divergence: onlyBatch=${(batch -- live).take(5)} onlyLive=${(live -- batch).take(5)}")

      // summary parity through the single stage-rule statement
      val liveSummary = LiveFunnel.summaryOf(updates.toDF()).collect().head
      val batchSummary = graft.queries.Relational.q21Funnel.fn(spark, dir).collect().head
      assert(liveSummary == batchSummary,
        s"summary divergence: live=$liveSummary batch=$batchSummary")
    } finally q.stop()
  }

  test("funnel state survives a checkpointed restart; late purchase completes it") {
    import spark.implicits._
    val d = restartDirs("funnel")
    def start() = {
      implicit val s: org.apache.spark.sql.SparkSession = spark
      val events = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_type STRING")
        .json(d.in).as[LiveFunnel.FEv]
      LiveFunnel.monitor(events)
        .writeStream.format("json")
        .option("path", d.out).option("checkpointLocation", d.cp)
        .outputMode(OutputMode.Append).start()
    }
    // run 1: user 7 views then clicks (out of order across files), user 8
    // only errors (must still be established for n_users), user 9 has a
    // NULL event time — batch q21's min(when(...)) drops it from the
    // stage mins but still counts the user, and the live fold must match
    // instead of NPE-ing the query (round-10 ADVICE)
    d.writeBatch("b1.json", Seq(
      """{"user_id": 7, "ts": "2024-01-01 12:05:00", "event_type": "click"}""",
      """{"user_id": 8, "ts": "2024-01-01 12:00:00", "event_type": "error"}""",
      """{"user_id": 9, "ts": null, "event_type": "view"}"""))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    d.writeBatch("b2.json", Seq(
      """{"user_id": 7, "ts": "2024-01-01 12:00:00", "event_type": "view"}"""))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    // run 3: SAME checkpoint — the purchase can only complete the funnel
    // if the view/click mins were recovered from state
    d.writeBatch("b3.json", Seq(
      """{"user_id": 7, "ts": "2024-01-01 12:10:00", "event_type": "purchase"}"""))
    val q3 = start(); q3.processAllAvailable(); q3.stop()

    val updates = spark.read
      .schema("user_id LONG, rev LONG, t_view LONG, t_click LONG, t_purchase LONG")
      .json(d.out)
    val summary = LiveFunnel.summaryOf(updates).collect().head
    assert(summary.getLong(0) == 3L, s"n_users: $summary")        // users 7, 8 and 9
    assert(summary.getLong(1) == 1L, s"n_view: $summary")         // 9's null-ts view folds no min
    assert(summary.getLong(2) == 1L, s"n_view_click: $summary")
    assert(summary.getLong(3) == 1L, s"n_full_funnel: $summary")
    // rev ordering: user 7's record advanced once per change, across restarts
    val revs = updates.filter(col("user_id") === 7L)
      .select("rev").collect().map(_.getLong(0)).sorted.toSeq
    assert(revs == Seq(1L, 2L, 3L), s"rev chain broken: $revs")
  }
}
