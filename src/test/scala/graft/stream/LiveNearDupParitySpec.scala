package graft.stream

import graft.SparkSpec
import graft.queries.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

/** Live≡batch parity for the near-dup candidate detector on the REAL
  * corpus, at two levels:
  *
  *  1. BAND-KEY parity: the stream's scalar band computation
  *     (`Dedup.bandValuesFor` — array_min over the distinct-shingle
  *     array) produces exactly the batch signature-aggregation's band
  *     keys (`Dedup.bandKeys`) for every document.  This is the
  *     load-bearing equivalence: min over the same distinct set.
  *  2. CANDIDATE parity: replaying the corpus through the streaming
  *     bucket state yields exactly d3's candidate pair set (the
  *     distinct self-join of the band keys) — so the live detector's
  *     recall guarantee IS the batch tier's.
  *  3. VERIFIED parity: the composed live verify stage
  *     (`verifiedPairs` — shingle sets carried in bucket state, exact
  *     Jaccard at emission) yields exactly d3's full verified relation
  *     `(doc_a, doc_b, jaccard)` after the cross-band distinct — the
  *     round-8 verdict's missing stage, closing the live pipeline at
  *     the same relation the batch tier ends on. */
class LiveNearDupParitySpec extends SparkSpec {

  test("scalar band values == batch signature bands; replayed candidates == d3's cand set (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.01")

    // 1. band-key parity, every document
    val batchKeys = Dedup.bandKeys(spark, dir)
      .select("doc_id", "band", "bv").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    graft.sentiment.GraftFunctions.register(spark)
    val scalarKeys = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          Dedup.bandValuesFor(col("text"))).as(Seq("band", "bv")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(scalarKeys == batchKeys,
      s"scalar/aggregate band keys diverge: only-scalar=${scalarKeys.diff(batchKeys).take(5)} " +
        s"only-batch=${batchKeys.diff(scalarKeys).take(5)}")

    // 2. candidate parity through the streaming bucket state
    val truth = batchKeys.groupBy(k => (k._2, k._3)).values.flatMap { ks =>
      val ids = ks.map(_._1).toSeq.sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => LiveNearDup.DocEvent(r.getLong(0), r.getString(1)))
    val input = MemoryStream[LiveNearDup.DocEvent]
    val q = LiveNearDup.candidates(input.toDS())
      .writeStream.format("memory").queryName("lnd_parity")
      .outputMode(OutputMode.Append).start()
    try {
      // split the replay across two batches so cross-batch pairing is
      // exercised on real data, not just the unit fixture
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val live = spark.table("lnd_parity").as[LiveNearDup.Candidate].collect()
        .map(c => (c.doc_a, c.doc_b)).toSet
      assert(live == truth,
        s"live candidates diverge from d3's banding: only-live=${live.diff(truth).take(5)} " +
          s"only-batch=${truth.diff(live).take(5)} (live=${live.size}, batch=${truth.size})")
      assert(truth.nonEmpty, "corpus planted no banding collisions — parity is vacuous")
    } finally q.stop()
  }

  test("replayed verified pairs == d3's full verified relation (sf0.01)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.01")

    val batch = Dedup.bandedJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "corpus planted no verified near-dups — parity is vacuous")

    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => LiveNearDup.DocEvent(r.getLong(0), r.getString(1)))
    val input = MemoryStream[LiveNearDup.DocEvent]
    val q = LiveNearDup.verifiedPairs(input.toDS())
      .writeStream.format("memory").queryName("lnd_vparity")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val perBand = spark.table("lnd_vparity").as[LiveNearDup.VerifiedPair].collect()
      // cross-band re-detections must carry the identical jaccard —
      // then the distinct relation IS d3's
      val live = perBand.map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
      assert(live.map(p => (p._1, p._2)).size == live.size,
        "the same pair carried different jaccard values across bands")
      assert(live == batch,
        s"live verified pairs diverge from d3: only-live=${live.diff(batch).take(5)} " +
          s"only-batch=${batch.diff(live).take(5)} (live=${live.size}, batch=${batch.size})")
    } finally q.stop()
  }

  test("HASHED verify tier == d3's full verified relation (sf0.01)") {
    // round 14's T14 floor-raiser: sorted shingle-hash arrays in bucket
    // state instead of string sets — SAME emitted relation on the real
    // corpus (an h0 collision inside one pair's union is the only way
    // they could differ; this corpus plants none)
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = sf("sf0.01")

    val batch = Dedup.bandedJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "corpus planted no verified near-dups — parity is vacuous")

    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => LiveNearDup.DocEvent(r.getLong(0), r.getString(1)))
    val input = MemoryStream[LiveNearDup.DocEvent]
    val q = LiveNearDup.verifiedPairsHashed(input.toDS())
      .writeStream.format("memory").queryName("lnd_hparity")
      .outputMode(OutputMode.Append).start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      input.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val perBand = spark.table("lnd_hparity").as[LiveNearDup.VerifiedPair].collect()
      val live = perBand.map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
      assert(live.map(p => (p._1, p._2)).size == live.size,
        "the same pair carried different jaccard values across bands")
      assert(live == batch,
        s"hashed verify diverges from d3: only-live=${live.diff(batch).take(5)} " +
          s"only-batch=${batch.diff(live).take(5)} (live=${live.size}, batch=${batch.size})")
    } finally q.stop()
  }
}
