package graft.queries

import graft.SparkSpec

/** d14's compositional contract: the incremental path (incoming-slice
  * band-key probe + exact verify) finds EXACTLY d3's verified relation
  * restricted to pairs touching the incoming slice — it can neither
  * find nor lose a pair the batch tier wouldn't — and labels each pair
  * correctly as new-old (batch doc hit the archive) or new-new (batch
  * self-dup). */
class IncrementalDedupSpec extends SparkSpec {

  test("d14 == d3's verified relation restricted to the incoming slice (sf0.01)") {
    val dir = sf("sf0.01")
    val d3 = Dedup.bandedJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = d3.filter(p => p._1 % 10 == 7 || p._2 % 10 == 7)
    assert(expected.nonEmpty, "no near-dup pair touches the incoming slice — vacuous")

    val got = Dedup.d14IncrementalDedup.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSet == expected,
      s"incremental relation diverges from d3-restricted: got=${got.toSeq}")
    got.foreach { g =>
      assert(g._1 % 10 == 7 || g._2 % 10 == 7, s"pair outside the slice: $g")
      val want = if (g._1 % 10 == 7 && g._2 % 10 == 7) "new-new" else "new-old"
      assert(g._4 == want, s"mislabeled pair: $g")
    }
    // the sf0.01 corpus plants both label kinds — keep that true, or the
    // labeling path stops being exercised
    assert(got.exists(_._4 == "new-new") && got.exists(_._4 == "new-old"),
      s"fixture no longer exercises both pair types: ${got.map(_._4).distinct.toSeq}")
  }

  test("the LIVE verified stage over archive-then-batch replay IS d14 (sf0.01)") {
    // The streaming near-dup detector performs incremental dedup by
    // construction: with the archive replayed first (its self-pairs
    // emitted and set aside), every pair emitted once the incoming
    // slice arrives involves ≥1 incoming doc — and must be EXACTLY
    // d14's batch relation. Live ≡ batch for the incremental shape.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.01")
    import org.apache.spark.sql.functions.col
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => graft.stream.LiveNearDup.DocEvent(r.getLong(0), r.getString(1)))
    val (incoming, archive) = docs.partition(_.doc_id % 10 == 7)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.stream.LiveNearDup.DocEvent]
    val q = graft.stream.LiveNearDup.verifiedPairs(input.toDS())
      .writeStream.format("memory").queryName("d14_live")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      input.addData(archive.toIndexedSeq: _*)
      q.processAllAvailable()
      val archivePairs = spark.table("d14_live")
        .as[graft.stream.LiveNearDup.VerifiedPair].collect()
        .map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
      input.addData(incoming.toIndexedSeq: _*)
      q.processAllAvailable()
      val afterBatch = spark.table("d14_live")
        .as[graft.stream.LiveNearDup.VerifiedPair].collect()
        .map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
      val liveIncremental = afterBatch.diff(archivePairs)
      val d14 = Dedup.d14IncrementalDedup.fn(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(liveIncremental == d14,
        s"live incremental pairs diverge from d14: " +
          s"only-live=${liveIncremental.diff(d14).take(5)} " +
          s"only-batch=${d14.diff(liveIncremental).take(5)}")
      // the archive-phase emissions are exactly the OLD-OLD pairs —
      // nothing involving the batch leaked out early
      assert(archivePairs.forall(p => p._1 % 10 != 7 && p._2 % 10 != 7),
        "an incoming-slice pair was emitted before the slice arrived")
    } finally q.stop()
  }
}
