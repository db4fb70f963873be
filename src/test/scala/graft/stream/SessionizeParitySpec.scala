package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for sessionization — the last member of the parity
  * family (T10↔a8, T10b↔a9, T12↔a10): the REAL events table replayed
  * through the streaming sessionizer must yield exactly the per-user
  * session statistics of the oracle-checked batch `q15` — same 30-min
  * gap rule, same µs-exact arithmetic, two execution modes.  The live
  * side emits raw sessions; this spec folds them with q15's own
  * aggregation recipe (count, floor-quantized averages) before
  * comparing. */
class SessionizeParitySpec extends SparkSpec {

  test("streaming sessions over events == batch q15 (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf("sf0.01")
    val events = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .as[Sessionize.Ev].collect().toSeq
    assert(events.size >= 500, s"fixture too small: ${events.size}")

    val input = MemoryStream[Sessionize.Ev]
    val q = Sessionize.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // sentinel far past the fixture: watermark passes every open
      // session's end+gap, flushing the remaining finals
      input.addData(Sessionize.Ev(-1L,
        java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))))
      q.processAllAvailable()

      def us(t: java.sql.Timestamp): Long = {
        val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
      }
      def floorQ(x: Double): Double = math.floor(x * 10000) / 10000
      val live = spark.table("sess_parity").collect()
        .map(r => (r.getLong(0), us(r.getTimestamp(1)), us(r.getTimestamp(2)),
          r.getInt(3)))
        .filter(_._1 != -1L)
        .groupBy(_._1).map { case (u, ss) =>
          val n = ss.length
          (u, n.toLong,
            floorQ(ss.map(_._4.toLong).sum.toDouble / n),
            floorQ(ss.map(x => x._3 - x._2).sum.toDouble / 1000000.0 / n))
        }.toSet

      val batch = graft.queries.Relational.q15Sessionization.fn(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet

      assert(batch.size >= 10, s"q15 fixture degenerate: ${batch.size} users")
      assert(live == batch,
        s"live/batch divergence: onlyBatch=${batch -- live} onlyLive=${live -- batch}")
    } finally q.stop()
  }
}
