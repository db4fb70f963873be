package graft.stream

import graft.SparkSpec
import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for the reference's namesake capability: the REAL
  * sf0.01 events table (the SF whose traffic contains real ≥1.5× burst days) replayed through the streaming burst detector
  * (day windows, a8's 15000 bp threshold and n ≥ 20 floor) must produce
  * exactly the adjacent-day rows and burst flags of the batch `a8`
  * query — the oracle-checked one. One rule, two execution modes,
  * provably identical output. */
class TrendBurstParitySpec extends SparkSpec {

  test("streaming day-window bursts over events == batch a8 (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val posts = graft.tables.Tables.events(spark, sf("sf0.01"))
      .select(col("event_type").as("label"), col("ts"))
      .as[TrendBurst.Post].collect().toSeq
    assert(posts.size >= 500, s"fixture too small: ${posts.size}")

    val DayMs = 86400000L
    val input = MemoryStream[TrendBurst.Post]
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 86400L,
      watermarkDelay = "0 seconds", factorBp = 15000L, minCount = 20L)
    val q = flags.writeStream.format("memory").queryName("burst_parity")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(posts: _*)
      q.processAllAvailable()
      // two sentinel advances: the first moves the watermark past every
      // fixture day, the second fires the event-time timeouts that
      // finalize keys with no further traffic of their own
      val far = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T00:00:00Z"))
      val farther = java.sql.Timestamp.from(java.time.Instant.parse("2024-07-01T00:00:00Z"))
      input.addData(TrendBurst.Post("zzz_sentinel", far))
      q.processAllAvailable()
      input.addData(TrendBurst.Post("zzz_sentinel", farther))
      q.processAllAvailable()

      // adjacent-day streaming rows (prev_n > 0 ⟺ an observed yesterday)
      val streamed = spark.table("burst_parity").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime / DayMs,
          r.getLong(3), r.getLong(2), r.getBoolean(4)))
        .filter { case (label, _, prevN, _, _) => label != "zzz_sentinel" && prevN > 0L }
        .toSet

      val batch = Analytics.a8TrendingBursts.fn(spark, sf("sf0.01")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getInt(5) == 1)).toSet

      assert(batch.nonEmpty, "a8 fixture degenerate")
      assert(batch.exists(_._5), "fixture has no burst day — parity would be vacuous")
      assert(streamed == batch,
        s"live/batch divergence: onlyBatch=${batch -- streamed} onlyStream=${streamed -- batch}")
    } finally q.stop()
  }
}
