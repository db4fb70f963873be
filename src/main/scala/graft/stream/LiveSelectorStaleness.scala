package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** Live DSIR selector-staleness monitor — batch `c12_selector_staleness`'s
  * streaming twin, completing the live side of the stored-model
  * maintenance triad (IVF cells: s13 → T16; PQ codebooks: s14 → T17;
  * the importance selector: c12 → this): arriving raw-pool documents
  * count their hashed token buckets SCAN-SIDE (the batch arithmetic as
  * a local loop — [[LiveDsirScorer.score]]'s sibling), a per-BUCKET
  * `flatMapGroupsWithState` folds the incoming count (state 2 longs per
  * bucket, ≤ B buckets total — bounded regardless of stream volume;
  * sums are commutative, no watermark), and [[reportOf]] joins the
  * STORED archive side ([[graft.queries.Curation.dsirArchiveBucketStats]])
  * and applies c12's OWN report expressions via the shared
  * [[graft.queries.Curation.selectorStalenessFromCounts]] — live ≡
  * batch by construction, and SelectorStalenessParitySpec measures it
  * anyway, checkpointed restart included. */
object LiveSelectorStaleness {

  /** An arriving raw-pool document (one event per doc). */
  final case class DocEv(doc_id: Long, text: String, source: String)

  final case class BucketState(rev: Long, nInc: Long)

  final case class BucketUpdate(b: Long, rev: Long, n_inc: Long)

  /** Scan-side token buckets of one document — c11/c12's hashing as a
    * local loop (every token counts, duplicates included: the batch
    * counters count token INSTANCES). */
  def tokenBuckets(text: String): Seq[Long] = {
    val bk = graft.queries.Curation.DsirBuckets
    text.trim.toLowerCase.split("\\s+").toSeq
      .map(t => graft.functions.CharFoldKernel.fold(UTF8String.fromString(t)) % bk)
  }

  def monitor(docs: Dataset[DocEv])(
      implicit spark: SparkSession): Dataset[BucketUpdate] = {
    import spark.implicits._
    val target = graft.queries.Curation.DsirTarget
    docs
      .filter((d: DocEv) => d.text != null && d.text.nonEmpty &&
        d.source != null && d.source != target)
      .flatMap(d => tokenBuckets(d.text))
      .groupByKey(identity)
      .flatMapGroupsWithState[BucketState, BucketUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (b: Long, batch: Iterator[Long], state: GroupState[BucketState]) =>
          val prev = state.getOption
          var n = prev.fold(0L)(_.nInc)
          var saw = false
          batch.foreach { _ => saw = true; n += 1L }
          if (saw) {
            val next = BucketState(prev.fold(1L)(_.rev + 1L), n)
            state.update(next)
            Iterator(BucketUpdate(b, next.rev, n))
          } else Iterator.empty
      }
  }

  /** c12's top-k drift report over a live update relation: latest count
    * per bucket (`max_by(rev)`), full-outer join with the ≤ B-row stored
    * archive stats (a bucket the archive never saw still drifts; a
    * bucket the stream hasn't touched still weighs), then the SHARED
    * batch expressions. */
  def reportOf(updates: DataFrame, archiveStats: DataFrame): DataFrame =
    graft.queries.Curation.selectorStalenessFromCounts(
      driftCountsOf(updates, archiveStats))

  /** The live per-bucket drift-counts relation `(b, ct_arch, cr_arch,
    * n_inc)` — the c12 report above and the live refresh decision
    * ([[LiveRefreshDecision]]) both read it: latest count per bucket
    * (`max_by(rev)`) full-outer-joined with the ≤ B-row stored archive
    * stats (a bucket the archive never saw still drifts; a bucket the
    * stream hasn't touched still weighs). */
  def driftCountsOf(updates: DataFrame, archiveStats: DataFrame): DataFrame = {
    val latest = updates
      .groupBy(col("b"))
      .agg(max_by(col("n_inc"), col("rev")).as("n_inc"))
    archiveStats.join(latest, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct_arch"), lit(0L)).as("ct_arch"),
        coalesce(col("cr_arch"), lit(0L)).as("cr_arch"),
        coalesce(col("n_inc"), lit(0L)).as("n_inc"))
  }
}
