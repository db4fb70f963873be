package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** LIVE near-duplicate CANDIDATE detection — the streaming counterpart
  * of the batch dedup tier's banding stage (d3 /
  * `Dedup.bandedJaccardPairs`): as documents arrive, each computes its
  * MinHash band keys SCAN-SIDE (`Dedup.bandValuesFor` — the same
  * Carter–Wegman family as d3, as pure scalar arithmetic: an
  * `array_min` per hash over the distinct-shingle array, no
  * aggregation), and a per-(band, bucket) keyed state emits a candidate
  * pair the moment two documents collide in any band.
  *
  * This is the PRODUCTION shape of streaming dedup: candidates stream
  * out with bounded per-event work, and the exact-Jaccard VERIFY —
  * which needs both documents' shingle sets — runs downstream in batch
  * over the (tiny) candidate stream, exactly as d3's verify step does.
  * Pigeonhole recall carries over unchanged from the batch tier: any
  * pair the batch banding would catch collides in the same band here,
  * because the band values are identical (LiveNearDupParitySpec pins
  * replay ≡ d3's candidate relation on the real corpus).
  *
  * == Scale shape ==
  *
  * Stage 1 is embarrassingly parallel (per-document column arithmetic,
  * no shuffle before the band-key exchange).  Stage 2's state is the
  * bucket membership: Σ bucket sizes = Bands·|docs| ids total, spread
  * over as many keys as there are occupied buckets — the same
  * occupancy the batch equi-join shuffles.  A skew-hot bucket (a
  * boilerplate band value shared by millions of docs) concentrates
  * both state and emitted pairs; `maxBucket` bounds it LOUDLY (fail,
  * never silently drop candidates) so a deployment sizes the knob
  * against its boilerplate profile — the run-away case a silent cap
  * would hide is exactly a dedup-worthy plague of near-identical docs.
  *
  * Replay hygiene: a checkpoint-replayed document is already a bucket
  * member — re-delivery emits nothing (set-membership idempotence; no
  * event-time ordering is needed because bucket membership is
  * order-free and pairs are emitted normalized).
  */
object LiveNearDup {

  final case class DocEvent(doc_id: Long, text: String)

  /** One band-key row: document `doc_id` occupies bucket (band, bv). */
  final case class BandRow(doc_id: Long, band: Int, bv: Long)

  /** A bucket's membership (sorted for deterministic emission order). */
  final case class Bucket(doc_ids: Seq[Long])

  /** An emitted candidate: doc_a < doc_b collided in (band, bv).  The
    * same pair may be emitted by several bands (d3's cand relation
    * applies DISTINCT across bands; a downstream verify dedups — the
    * stream keeps per-band provenance instead). */
  final case class Candidate(doc_a: Long, doc_b: Long, band: Int, bv: Long)

  /** Live candidate pairs over a document stream. */
  def candidates(docs: Dataset[DocEvent], maxBucket: Int = 100000)(
      implicit spark: SparkSession): Dataset[Candidate] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.sentiment.GraftFunctions.register(spark)
    val banded: Dataset[BandRow] = docs
      .select(col("doc_id"),
        posexplode(graft.queries.Dedup.bandValuesFor(col("text"))).as(Seq("band", "bv")))
      .as[BandRow]
    banded
      .groupByKey(r => (r.band, r.bv))
      .flatMapGroupsWithState[Bucket, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, bv), rows: Iterator[BandRow], state: GroupState[Bucket]) =>
          val existing = state.getOption.map(_.doc_ids).getOrElse(Seq.empty)
          val seen = scala.collection.mutable.LinkedHashSet(existing: _*)
          val out = Seq.newBuilder[Candidate]
          // in-batch arrivals pair against earlier members AND each other,
          // in sorted order so emission is deterministic per batch
          rows.map(_.doc_id).toSeq.distinct.sorted.foreach { id =>
            if (!seen.contains(id)) {
              seen.foreach { m =>
                out += Candidate(math.min(m, id), math.max(m, id), band, bv)
              }
              seen += id
            }
          }
          require(seen.size <= maxBucket,
            s"band bucket ($band, $bv) exceeded $maxBucket members — " +
              "boilerplate-grade duplication; raise maxBucket or dedup upstream")
          if (seen.size != existing.size) state.update(Bucket(seen.toVector))
          out.result().iterator
      }
  }
}
