package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Unit behavior of the live Count-Min sketch: snapshot shape, cumulative
  * folding across finalized windows, duplicate-window drop (replay
  * idempotence), and the topK read path. Live≡batch parity against the
  * oracle-checked `a10` is pinned separately in
  * [[LiveHeavyHittersParitySpec]]. */
class LiveHeavyHittersSpec extends SparkSpec {

  import graft.queries.Analytics.{CmsA, CmsB, CmsD, CmsW, KmvP}

  private def ev(u: Long, iso: String) = LiveHeavyHitters.Event(
    u, java.sql.Timestamp.from(java.time.Instant.parse(iso)))

  private def bkt(u: Long, i: Int): Int =
    (((u % KmvP) * CmsA(i) + CmsB(i)) % KmvP % CmsW).toInt

  test("snapshots fold finalized windows cumulatively, one row per hash row") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LiveHeavyHitters.Event]
    val q = LiveHeavyHitters.sketch(input.toDS(), windowSec = 60L)
      .writeStream.format("memory").queryName("lhh_unit")
      .outputMode(OutputMode.Append).start()
    try {
      // w0: user 7 twice, user 11 once; w1 closes w0
      input.addData(ev(7, "2024-01-01T00:00:10Z"), ev(7, "2024-01-01T00:00:20Z"),
        ev(11, "2024-01-01T00:00:30Z"))
      q.processAllAvailable()
      input.addData(ev(7, "2024-01-01T00:01:10Z"))
      q.processAllAvailable()
      val snap0 = spark.table("lhh_unit").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).toInstant.toString,
          r.getSeq[Long](2)))
      // exactly one snapshot per hash row, all for w0
      assert(snap0.length == CmsD, s"got ${snap0.toSeq}")
      assert(snap0.forall(_._2 == "2024-01-01T00:00:00Z"))
      (0 until CmsD).foreach { i =>
        val c = snap0.find(_._1 == i).get._3
        assert(c.sum == 3, s"row $i total ${c.sum}")
        assert(c(bkt(7, i)) >= 2 && c(bkt(11, i)) >= 1)
      }
      // sentinel far ahead finalizes w1 → cumulative counters (4 events)
      input.addData(ev(999, "2024-01-01T02:00:00Z"))
      q.processAllAvailable()
      val latest = spark.table("lhh_unit").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getSeq[Long](2)))
        .groupBy(_._1).map { case (i, rs) => i -> rs.maxBy(_._2)._3 }
      (0 until CmsD).foreach { i =>
        assert(latest(i).sum == 4, s"row $i cumulative ${latest(i).sum}")
        assert(latest(i)(bkt(7, i)) >= 3)
      }
      // topK reads min-over-rows estimates; exact here (no collisions forced)
      val top = LiveHeavyHitters.topK(latest.toMap, Seq(7L, 11L), 2)
      assert(top == Seq((7L, 3L), (11L, 1L)), s"got $top")
    } finally q.stop()
  }

  test("scale shape: 10k distinct users leave <= d*w windowed-state rows and d sketch rows") {
    // THE constant-width contract under key-cardinality stress: the
    // stream carries 10,000 DISTINCT user_ids in one window, and the
    // stateful footprint must stay bounded by the SKETCH, not the keys —
    // the windowed aggregation stores (window, i, bkt) cells (≤ d·w =
    // 768 per open window) and stage 2 holds exactly d counter rows.
    // Plan order must match the two-stage shape: fmgws consumes the
    // finalized windows ABOVE the state store, with the partial
    // (map-side) count below the shuffle.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LiveHeavyHitters.Event]
    val q = LiveHeavyHitters.sketch(input.toDS(), windowSec = 60L)
      .writeStream.format("memory").queryName("lhh_scale")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((0 until 10000).map(u => ev(u.toLong, "2024-01-01T12:00:30Z")): _*)
      q.processAllAvailable()
      input.addData(ev(0L, "2024-01-01T12:02:00Z")) // finalize w0
      q.processAllAvailable()

      val plan = {
        val bos = new java.io.ByteArrayOutputStream()
        scala.Console.withOut(new java.io.PrintStream(bos)) { q.explain(extended = false) }
        bos.toString
      }
      val iFmgws = plan.indexOf("FlatMapGroupsWithState")
      val iSave = plan.indexOf("StateStoreSave")
      val iPartial = plan.indexOf("partial_count")
      assert(iFmgws >= 0 && iSave >= 0 && iPartial >= 0 &&
        iFmgws < iSave && iSave < iPartial,
        s"two-stage shape broken (fmgws=$iFmgws save=$iSave partial=$iPartial):\n$plan")

      val ops = q.recentProgress.reverseIterator
        .map(_.stateOperators).find(_.nonEmpty).getOrElse(fail("no state ops"))
      val aggRows = ops.find(_.operatorName.contains("stateStoreSave"))
        .map(_.numRowsTotal).getOrElse(-1L)
      val fmgwsRows = ops.find(_.operatorName.contains("flatMapGroupsWithState"))
        .map(_.numRowsTotal).getOrElse(-1L)
      assert(aggRows >= 0 && aggRows <= CmsD * CmsW,
        s"windowed state tracked keys, not sketch cells: $aggRows rows " +
          s"(bound ${CmsD * CmsW}) for 10k users")
      assert(fmgwsRows == CmsD,
        s"stage-2 state must be exactly $CmsD sketch rows, got $fmgwsRows")

      // and the folded counters still account for every event
      val latest = spark.table("lhh_scale").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getSeq[Long](2)))
        .groupBy(_._1).map { case (i, rs) => i -> rs.maxBy(_._2)._3 }
      (0 until CmsD).foreach(i => assert(latest(i).sum == 10000L,
        s"row $i dropped events: ${latest(i).sum}"))
    } finally q.stop()
  }

  test("sketch counters survive a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val cp = java.nio.file.Files.createTempDirectory("lhh-cp").toString
    val out = java.nio.file.Files.createTempDirectory("lhh-out").toString
    val in = java.nio.file.Files.createTempDirectory("lhh-in").toString
    def writeLines(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes)
    def start() = LiveHeavyHitters.sketch(
      spark.readStream.schema("user_id BIGINT, ts TIMESTAMP").json(in)
        .as[LiveHeavyHitters.Event], windowSec = 60L)
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()

    // run 1: w0 holds user 7 ×3; the 12:01 row advances the watermark to
    // finalize it — 3 counts land in the STATE — then STOP.
    val q1 = start()
    try {
      writeLines("b0.json", Seq(
        """{"user_id": 7, "ts": "2024-01-01 12:00:01"}""",
        """{"user_id": 7, "ts": "2024-01-01 12:00:02"}""",
        """{"user_id": 7, "ts": "2024-01-01 12:00:03"}"""))
      q1.processAllAvailable()
      writeLines("b1.json", Seq("""{"user_id": 7, "ts": "2024-01-01 12:01:30"}"""))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: finalize w1 (the 12:01 event) with a far sentinel.  The
    // folded counters must show 4 total for user 7's buckets — w0's 3
    // crossed the stop inside the state store; had state been lost the
    // restart would report only w1's single count.
    val q2 = start()
    try {
      writeLines("b2.json", Seq("""{"user_id": 999, "ts": "2024-01-01 14:00:00"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val latest = spark.read
      .schema("i INT, upto TIMESTAMP, counters ARRAY<BIGINT>")
      .json(out).collect()
      .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getSeq[Long](2)))
      .groupBy(_._1).map { case (i, rs) => i -> rs.maxBy(_._2)._3 }
    assert(latest.keySet == (0 until CmsD).toSet, s"rows: ${latest.keySet}")
    (0 until CmsD).foreach { i =>
      assert(latest(i).sum == 4 && latest(i)(bkt(7, i)) >= 4,
        s"row $i lost pre-restart counts: total=${latest(i).sum}, " +
          s"bkt(7)=${latest(i)(bkt(7, i))} (want 4)")
    }
  }

  test("a replayed duplicate window is dropped whole (restart idempotence)") {
    // Feed the stage-2 fold directly: the guard drops any window whose
    // start is <= the newest folded one, so re-delivered deltas (a
    // checkpoint replay) cannot double-count.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LiveHeavyHitters.Event]
    val q = LiveHeavyHitters.sketch(input.toDS(), windowSec = 60L)
      .writeStream.format("memory").queryName("lhh_dup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(5, "2024-01-01T00:00:05Z"))
      input.addData(ev(5, "2024-01-01T00:02:05Z")) // finalizes w0
      q.processAllAvailable()
      // LATE event for already-finalized w0: watermark (delay 0) has
      // passed, stage 1 drops it — state must not change
      input.addData(ev(5, "2024-01-01T00:00:40Z"))
      input.addData(ev(5, "2024-01-01T00:05:00Z")) // finalizes w2
      q.processAllAvailable()
      val latest = spark.table("lhh_dup").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1).getTime, r.getSeq[Long](2)))
        .groupBy(_._1).map { case (i, rs) => i -> rs.maxBy(_._2)._3 }
      (0 until CmsD).foreach { i =>
        assert(latest(i).sum == 2, // late w0 event NOT recounted
          s"row $i saw ${latest(i).sum} events, want 2 (late-data leak?)")
      }
    } finally q.stop()
  }
}
