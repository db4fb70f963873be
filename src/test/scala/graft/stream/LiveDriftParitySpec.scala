package graft.stream

import graft.SparkSpec
import graft.queries.Analytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.streaming.OutputMode

/** Live≡batch parity for the drift monitor against the ORACLED `a13`
  * on the real events table: a13 splits the table at its calendar
  * midpoint and scores period 1 against period 0 on the 256-bin grid;
  * here period 0 becomes the monitor's broadcast REFERENCE profile,
  * period 1 replays through the stream, and after the final window
  * closes every per-type alert must carry exactly a13's
  * (n0, n1, ks_scaled, ks_bp) — the statistic is symmetric in
  * |c_live·n_ref − c_ref·n_live|, so live-vs-reference equals the batch
  * period-1-vs-period-0 walk bin for bin. */
class LiveDriftParitySpec extends SparkSpec {

  test("final live alerts over replayed period-1 events == a13 rows (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sf("sf0.01")
    val raw = graft.tables.Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("ts"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2), r.getLong(3)))
    assert(raw.length >= 500, s"fixture too small: ${raw.length}")

    // a13's grid and period split, recomputed exactly
    val minmax = raw.map(_._4).min + raw.map(_._4).max
    val fmin = math.floor(raw.map(_._2).min).toLong
    val fmax = math.floor(raw.map(_._2).max).toLong
    val bins = 256
    def bin(v: Double): Int =
      ((math.floor(v).toLong - fmin) * bins / (fmax - fmin + 1)).toInt
    val (p0, p1) = raw.partition(r => r._4 * 2 <= minmax)
    assert(p0.nonEmpty && p1.nonEmpty)

    // reference = period-0 per-type histograms
    val reference = p0.groupBy(_._1).map { case (t, rows) =>
      val h = new Array[Long](bins)
      rows.foreach(r => h(bin(r._2)) += 1L)
      t -> h.toSeq
    }

    val input = MemoryStream[LiveDrift.Event]
    val q = LiveDrift.monitor(input.toDS(), reference, fmin, fmax, bins,
      windowSec = 3600L)
      .writeStream.format("memory").queryName("ld_parity")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(p1.map(r => LiveDrift.Event(r._1, r._2, r._3)): _*)
      q.processAllAvailable()
      // far sentinel finalizes every real window; its own never closes
      input.addData(LiveDrift.Event("__sentinel__", 0.0,
        java.sql.Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z"))))
      q.processAllAvailable()

      val live = spark.table("ld_parity").as[LiveDrift.DriftAlert].collect()
        .filter(_.event_type != "__sentinel__")
        .groupBy(_.event_type).map { case (t, as) => t -> as.maxBy(_.upto.getTime) }

      val a13 = Analytics.a13BinnedDrift.fn(spark, dir).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // a13 keeps types with both periods non-empty; every such type must
      // have a live alert, and the numbers must match exactly
      assert(a13.nonEmpty)
      assert(a13.keySet.subsetOf(live.keySet),
        s"types missing live alerts: ${a13.keySet.diff(live.keySet)}")
      a13.foreach { case (t, (n0, n1, ks, bp)) =>
        val a = live(t)
        assert((a.n_ref, a.n_live, a.ks_scaled, a.ks_bp) == ((n0, n1, ks, bp)),
          s"$t: live (${a.n_ref}, ${a.n_live}, ${a.ks_scaled}, ${a.ks_bp}) " +
            s"!= a13 ($n0, $n1, $ks, $bp)")
      }
    } finally q.stop()
  }
}
