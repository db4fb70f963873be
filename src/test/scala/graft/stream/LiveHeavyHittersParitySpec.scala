package graft.stream

import graft.SparkSpec
import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{array, call_function, col, lit}
import org.apache.spark.sql.streaming.OutputMode

/** Live/batch parity for Count-Min heavy hitters at the STATE level: the
  * REAL events table replayed through the streaming sketch must leave
  * every counter equal to the batch `graft_cms` aggregate's (the sketch
  * `a10` reads its oracle-checked estimates from) — tumbling windows tile
  * time and the sketch is a commutative monoid, so the per-window fold
  * must reach the same totals. Then the topK read path over the live
  * snapshot must reproduce `a10`'s exact 15 output rows. */
class LiveHeavyHittersParitySpec extends SparkSpec {

  import graft.queries.Analytics.{CmsA, CmsB, CmsD, CmsW, KmvP}

  test("live sketch counters over events == batch graft_cms, topK == a10 (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf("sf0.01")
    val events = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .as[LiveHeavyHitters.Event].collect().toSeq
    assert(events.size >= 500, s"fixture too small: ${events.size}")

    val input = MemoryStream[LiveHeavyHitters.Event]
    val q = LiveHeavyHitters.sketch(input.toDS(), windowSec = 3600L)
      .writeStream.format("memory").queryName("lhh_parity")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // sentinel beyond the fixture finalizes every real hour; its own
      // window never finalizes so it is absent from the folded state
      input.addData(LiveHeavyHitters.Event(-1L,
        java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))))
      q.processAllAvailable()

      val latest = spark.table("lhh_parity").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getSeq[Long](2)))
        .groupBy(_._1).map { case (i, rs) => i -> rs.maxBy(_._2)._3 }

      // batch sketch: a10's aggregate, sliced row-major
      graft.sentiment.GraftFunctions.register(spark)
      def bucket(i: Int) =
        ((col("user_id") % KmvP) * CmsA(i) + CmsB(i)) % KmvP % CmsW
      val cms = graft.tables.Tables.events(spark, dir)
        .agg(call_function("graft_cms",
          array((0 until CmsD).map(bucket): _*), lit(CmsW)).as("cms"))
        .collect()(0).getSeq[Long](0)
      assert(cms.length == CmsD * CmsW)
      (0 until CmsD).foreach { i =>
        val batchRow = cms.slice(i * CmsW, (i + 1) * CmsW)
        assert(latest(i) == batchRow,
          s"sketch row $i diverges: live=${latest(i).take(8)}… batch=${batchRow.take(8)}…")
      }

      // read path: live topK == a10's oracle-checked output
      val candidates = events.map(_.user_id).distinct
      val liveTop = LiveHeavyHitters.topK(latest.toMap, candidates, 15)
      val batchTop = Analytics.a10HeavyHitters.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(liveTop == batchTop,
        s"top-15 diverges:\nlive =$liveTop\nbatch=$batchTop")
    } finally q.stop()
  }
}
