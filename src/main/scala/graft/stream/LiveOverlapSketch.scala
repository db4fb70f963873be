package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** Live cross-source overlap monitor — batch `d17_overlap_sketch`'s
  * streaming twin, and the deployment shape the d17 doc promises ("d16
  * is the exact audit; d17 is what runs continuously"): arriving
  * documents fold their distinct word-trigram shingle hashes into ONE
  * bounded KMV synopsis per source held in keyed state (≤ k longs per
  * source — the same buffer discipline as the batch
  * `graft_kmv_mins` aggregate, so state never grows with the corpus),
  * and the pairwise overlap report applies d17's OWN estimator
  * expressions ([[graft.queries.TextOps.overlapFromSketches]] — shared,
  * not restated, so live ≡ batch holds by construction and
  * OverlapParitySpec measures it anyway).
  *
  * KMV folding is commutative and idempotent over hash VALUES (a
  * TreeSet offer), so no watermark and no event-time ordering is
  * needed (the LiveFunnel argument) — replaying any permutation or
  * re-chunking of the corpus lands the identical sketch.  Emission is
  * the house contract: `rev`-chained [[SketchUpdate]]s, `max_by(rev)`
  * consumers. */
object LiveOverlapSketch {

  /** An arriving document (one event per doc). */
  final case class DocEv(doc_id: Long, text: String, source: String)

  final case class SketchState(rev: Long, mins: Array[Long])

  final case class SketchUpdate(source: String, rev: Long, mins: Seq[Long])

  /** Scan-side distinct shingle hashes of one document — the batch
    * pipeline (tokens → distinct word trigrams → charfold) as a local
    * loop, the proven-equivalent replay shape of SourceOverlapSpec. */
  def shingleHashes(text: String): Seq[Long] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (text.trim.isEmpty || w.length < 3) Seq.empty
    else (0 to w.length - 3).iterator
      .map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet.iterator
      .map((sh: String) =>
        graft.functions.CharFoldKernel.fold(UTF8String.fromString(sh)))
      .toSeq
  }

  def monitor(docs: Dataset[DocEv],
      k: Int = graft.queries.TextOps.OverlapSketchK)(
      implicit spark: SparkSession): Dataset[SketchUpdate] = {
    import spark.implicits._
    require(k >= 2, s"graft: live overlap sketch needs k >= 2, got $k")
    docs
      .filter((d: DocEv) => d.text != null && d.text.nonEmpty && d.source != null)
      .flatMap(d => shingleHashes(d.text).map(h => (d.source, h)))
      .groupByKey(_._1)
      .flatMapGroupsWithState[SketchState, SketchUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[(String, Long)], state: GroupState[SketchState]) =>
          val buf = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.mins.foreach(v => buf.add(v): Unit))
          var saw = false
          batch.foreach { case (_, h) =>
            saw = true
            // the SHARED batch offer step (KmvMins.offer) — not restated
            // here, so the live==batch sketch parity holds by construction
            graft.functions.KmvMins.offer(buf, h, k,
              graft.functions.CharFoldKernel.Prime)
          }
          if (saw) {
            val mins = new Array[Long](buf.size)
            val it = buf.iterator()
            var i = 0
            while (it.hasNext) { mins(i) = it.next(); i += 1 }
            val next = SketchState(state.getOption.fold(1L)(_.rev + 1L), mins)
            state.update(next)
            Iterator(SketchUpdate(src, next.rev, mins.toSeq))
          } else Iterator.empty
      }
  }

  /** d17's pairwise overlap report over a live update relation: latest
    * sketch per source (`max_by(rev)`), then the SHARED batch estimator
    * ([[graft.queries.TextOps.overlapFromSketches]]). */
  def reportOf(updates: DataFrame,
      k: Int = graft.queries.TextOps.OverlapSketchK): DataFrame =
    graft.queries.TextOps.overlapFromSketches(latestOf(updates), k)

  /** d18's three-way overlap report over the same live state — the
    * pooled-mins theorem means the triple estimates read off the
    * identical per-source synopses (SHARED batch estimator,
    * [[graft.queries.TextOps.threeWayFromSketches]]). */
  def threeWayReportOf(updates: DataFrame,
      k: Int = graft.queries.TextOps.OverlapSketchK): DataFrame =
    graft.queries.TextOps.threeWayFromSketches(latestOf(updates), k)

  /** c14's overlap-aware mixing plan over the same live state — the
    * consumption loop closed in streaming too: effective (deduplicated)
    * mass per source via the SHARED inclusion–exclusion
    * ([[graft.queries.TextOps.effectiveSourceMass]]) over the live
    * synopses, then the SHARED mixing arithmetic
    * ([[graft.queries.Curation.overlapAwareMixingPlan]]).  No new
    * stream stage and no new state — a derived report over T19's
    * per-source KMV sketches, so a fleet re-prices its mixture
    * continuously at sketch-report cost. */
  def mixingPlanOf(updates: DataFrame,
      k: Int = graft.queries.TextOps.OverlapSketchK): DataFrame =
    graft.queries.Curation.overlapAwareMixingPlan(
      graft.queries.TextOps.effectiveSourceMass(latestOf(updates), k))

  /** Latest sketch per source (`max_by(rev)`). */
  private def latestOf(updates: DataFrame): DataFrame =
    updates
      .groupBy(col("source"))
      .agg(max_by(col("mins"), col("rev")).as("mins"))
}
