package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Scale-shape evidence for the two-stage burst detector: the fix for the
  * round-5 hot-key finding was to stop shuffling raw posts to a
  * cardinality-~3 stateful key.  These specs pin the shape that makes that
  * true, under a planted 90%-one-label stream:
  *
  *  1. the physical plan runs a PARTIAL HashAggregate (map-side combine)
  *     below the aggregation shuffle, and the label-keyed
  *     FlatMapGroupsWithState consumes the windowed aggregation's output
  *     (stage order in the plan: fmgws above StateStoreSave/Restore above
  *     partial_count) — so the label shuffle carries one row per finalized
  *     (label, window), never the firehose;
  *
  *  2. stage-2 state self-cleans: a label's adjacency baseline is removed
  *     once the watermark proves its successor window cannot finalize
  *     (lastStart + 2·windowMs), so high-cardinality keys (hashtags,
  *     users) cannot leak state — observable as the fmgws operator's
  *     numRowsTotal dropping to zero. */
class TrendBurstScaleSpec extends SparkSpec {

  private def post(label: String, iso: String) =
    TrendBurst.Post(label, java.sql.Timestamp.from(java.time.Instant.parse(iso)))

  test("plan: partial HashAggregate below the shuffle; fmgws consumes finalized windows") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TrendBurst.Post]
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", factorBp = 20000L, minCount = 3L)
    val q = flags.writeStream
      .format("memory").queryName("burst_plan").outputMode(OutputMode.Append).start()
    try {
      // 90% of the traffic on ONE label — the exact skew that made the
      // old single-stage shape a hot-key. The plan must still reduce it
      // map-side before any label-keyed shuffle.
      val skewed = Seq.tabulate(90)(i => post("pos", f"2024-01-01T12:00:${i % 60}%02dZ")) ++
        Seq.tabulate(10)(i => post(s"neg${i % 3}", f"2024-01-01T12:00:${i}%02dZ"))
      input.addData(skewed: _*)
      q.processAllAvailable()
      input.addData(post("pos", "2024-01-01T12:05:00Z"))
      q.processAllAvailable()

      val plan = {
        val bos = new java.io.ByteArrayOutputStream()
        scala.Console.withOut(new java.io.PrintStream(bos)) { q.explain(extended = false) }
        bos.toString
      }
      val iFmgws = plan.indexOf("FlatMapGroupsWithState")
      val iSave = plan.indexOf("StateStoreSave")
      val iRestore = plan.indexOf("StateStoreRestore")
      val iPartial = plan.indexOf("partial_count")
      assert(iFmgws >= 0 && iSave >= 0 && iRestore >= 0 && iPartial >= 0,
        s"expected two-stage stateful plan, got:\n$plan")
      assert(iFmgws < iSave && iSave < iRestore && iRestore < iPartial,
        s"stage order wrong (fmgws=$iFmgws save=$iSave restore=$iRestore partial=$iPartial):\n$plan")
      // sanity: the detector still works on the skewed stream
      val pos = spark.table("burst_plan").collect()
        .filter(r => r.getString(0) == "pos")
      assert(pos.exists(r => r.getTimestamp(1).toInstant.toString == "2024-01-01T12:00:00Z"
        && r.getLong(2) == 90L), s"skewed window lost rows: ${pos.mkString(";")}")
    } finally q.stop()
  }

  test("stage-2 state self-removes once the adjacency baseline is provably dead") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TrendBurst.Post]
    val flags = TrendBurst.bursts(input.toDS(), windowSec = 60L,
      watermarkDelay = "0 seconds", factorBp = 20000L, minCount = 3L)
    val q = flags.writeStream
      .format("memory").queryName("burst_ttl").outputMode(OutputMode.Append).start()
    try {
      // many one-shot keys (the hashtag/user reuse scenario): each
      // finalizes one window, then goes silent forever
      input.addData(Seq.tabulate(20)(i => post(s"tag$i", "2024-01-01T12:00:30Z")): _*)
      q.processAllAvailable()
      // advance the watermark far past every baseline's dead point
      // (lastStart + 2 windows); the second advance runs the batch in
      // which the scheduled event-time timeouts fire and remove state
      input.addData(post("late", "2024-01-01T13:00:00Z"))
      q.processAllAvailable()
      input.addData(post("late", "2024-01-01T14:00:00Z"))
      q.processAllAvailable()
      input.addData(post("late", "2024-01-01T15:00:00Z"))
      q.processAllAvailable()

      // every tagN window was emitted exactly once...
      val tags = spark.table("burst_ttl").collect().filter(_.getString(0).startsWith("tag"))
      assert(tags.length == 20, s"expected 20 finalized tag windows, got ${tags.length}")
      // ...and the label-keyed operator holds no state for them anymore:
      // only `late`'s baseline (if still within its horizon) may remain
      val fmgws = q.lastProgress.stateOperators
        .find(_.operatorName.toLowerCase.contains("flatmapgroups"))
        .getOrElse(fail(s"no fmgws operator in ${q.lastProgress.stateOperators.map(_.operatorName).mkString(",")}"))
      assert(fmgws.numRowsTotal <= 1L,
        s"baselines leaked: fmgws holds ${fmgws.numRowsTotal} state rows (expected ≤ 1)")
    } finally q.stop()
  }
}
