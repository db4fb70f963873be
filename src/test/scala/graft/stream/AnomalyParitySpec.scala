package graft.stream

import graft.SparkSpec
import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for rolling z-score anomaly detection: the REAL
  * events table replayed through the streaming detector (1 h tumbling
  * windows, W=24 observed-window baseline, 3σ exact integer test) must
  * produce exactly the rows of the batch `a9` query — the
  * DuckDB-oracle-checked one.  One rule, two execution modes, provably
  * identical output: epoch-aligned `window(ts, 1 hour)` buckets like
  * `date_trunc('hour')`, the stage-2 count ring replays `a9`'s ROWS
  * BETWEEN 24 PRECEDING AND 1 PRECEDING frame over observed hours, and
  * both arms of the test are exact integer arithmetic. */
class AnomalyParitySpec extends SparkSpec {

  test("streaming hourly z-score anomalies over events == batch a9 (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.tables.Tables.events(spark, sf("sf0.01"))
      .select(col("event_type").as("key"), col("ts"))
      .as[AnomalyZscore.Event].collect().toSeq
    assert(events.size >= 500, s"fixture too small: ${events.size}")

    val input = MemoryStream[AnomalyZscore.Event]
    val flags = AnomalyZscore.anomalies(input.toDS(), windowSec = 3600L,
      watermarkDelay = "0 seconds", baselineWindows = 24)
    val q = flags.writeStream.format("memory").queryName("anom_parity")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // one sentinel far past the fixture finalizes every real hour
      // (no timeouts in play: flags emit the moment a window finalizes)
      input.addData(AnomalyZscore.Event("zzz_sentinel",
        java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))))
      q.processAllAvailable()

      val streamed = spark.table("anom_parity").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3), r.getInt(4)))
        .filter(_._1 != "zzz_sentinel").toSet

      val batch = Analytics.a9AnomalyZscore.fn(spark, sf("sf0.01")).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet

      // (drop-direction −1 anomalies only occur in the sf0.1 fixture —
      // too big for a MemoryStream replay; AnomalySpec pins that path)
      assert(batch.size >= 10, s"a9 fixture degenerate: ${batch.size} anomalies")
      assert(streamed == batch,
        s"live/batch divergence: onlyBatch=${batch -- streamed} onlyStream=${streamed -- batch}")
    } finally q.stop()
  }
}
