package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream/batch parity for the interval attribution join: the SAME
  * randomized (seeded) views/clicks, driven through MemoryStream in
  * arbitrary chunking, must produce exactly the rows a batch join with
  * the same interval condition produces — once the watermark has passed
  * everything. This pins the streaming implementation to declarative
  * join semantics rather than to whatever one hand-built example
  * happens to exercise. */
class StreamJoinParitySpec extends SparkSpec {

  private val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
  private def at(sec: Long) =
    java.sql.Timestamp.from(base.plusSeconds(sec))

  test("inner interval join matches the batch join on randomized data (seed 42)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val horizon = 120L
    val views = Seq.tabulate(60) { i =>
      StreamJoin.View(rnd.nextInt(8).toLong, 100L + i, at(rnd.nextInt(1800).toLong))
    }
    val clicks = Seq.tabulate(120) { i =>
      StreamJoin.Click(rnd.nextInt(8).toLong, 9000L + i, at(rnd.nextInt(1800).toLong))
    }

    // batch truth: same condition, plain join
    val expected = views.toDS().toDF()
      .withColumnRenamed("user_id", "vu")
      .join(clicks.toDS().toDF().withColumnRenamed("user_id", "cu"),
        expr(s"vu = cu AND click_ts >= view_ts AND click_ts <= view_ts + INTERVAL $horizon SECONDS"))
      .select(col("view_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture degenerate: batch join matched nothing")

    val vIn = MemoryStream[StreamJoin.View]
    val cIn = MemoryStream[StreamJoin.Click]
    // delay > the 1800 s fixture span: shuffled chunk order can never make
    // a fixture row late (late-drop is watermark semantics, not join
    // semantics — parity is asserted for the join); the far-future sentinel
    // then closes every buffered row at once
    val q = StreamJoin.inner(vIn.toDS(), cIn.toDS(), horizonSec = horizon,
        delay = "2 hours")
      .writeStream.format("memory").queryName("parity_inner")
      .outputMode(OutputMode.Append).start()
    try {
      // feed in shuffled, uneven chunks to exercise cross-batch buffering
      val vChunks = rnd.shuffle(views).grouped(17).toSeq
      val cChunks = rnd.shuffle(clicks).grouped(29).toSeq
      vChunks.zipAll(cChunks, Seq.empty[StreamJoin.View], Seq.empty[StreamJoin.Click])
        .foreach { case (vs, cs) =>
          if (vs.nonEmpty) vIn.addData(vs: _*)
          if (cs.nonEmpty) cIn.addData(cs: _*)
          q.processAllAvailable()
        }
      // push both watermarks far past every fixture event
      vIn.addData(StreamJoin.View(99L, 999L, at(100000L)))
      cIn.addData(StreamJoin.Click(99L, 9999L, at(100000L)))
      q.processAllAvailable()
      val got = spark.table("parity_inner")
        .filter(col("view_id") =!= 999L)
        .select(col("view_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"stream/batch divergence: missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }
}
