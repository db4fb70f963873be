package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

/** Live DSIR importance scorer — batch `c11_dsir_selection`'s streaming
  * twin, extending the batch↔stream symmetry to the SELECTION stage: the
  * stored importance model loads as a driver-side value
  * ([[graft.queries.Curation.dsirWeightExport]] — the ≤ B-row bucket→
  * weight map plus the (N_t, N_r) totals), each arriving raw-pool
  * document scores SCAN-SIDE with the batch query's exact integer
  * arithmetic, and a per-SOURCE `flatMapGroupsWithState` folds document
  * count, score mass, and the count above a selection floor — the live
  * acceptance monitor a streaming ingest runs against a trained
  * selector.  Sums are commutative — no watermark, no event-time
  * ordering (the LiveFunnel argument); state is 4 longs per source.
  *
  * The one semantic the live path adds over batch: an arriving document
  * can carry a bucket the training corpus never saw (the batch join
  * can't — its weights trained on the same corpus).  The unseen-bucket
  * weight is the SAME Laplace formula at ct = cr = 0,
  * `(N_r+B)·10⁴ div (N_t+B)`, so the export's totals make the live
  * scorer total — no silent token drops.
  *
  * Emission and report contracts are [[LiveIndexStaleness]]'s verbatim:
  * `rev`-chained [[SourceUpdate]]s, `max_by(rev)` consumers.
  * DsirParitySpec pins live ≡ batch per-source totals over the real
  * corpus, chunked replay and checkpointed restart included. */
object LiveDsirScorer {

  /** An arriving raw-pool document (one event per doc). */
  final case class DocEv(doc_id: Long, text: String, source: String)

  final case class SrcState(rev: Long, nDocs: Long, sumScore: Long, nSel: Long)

  final case class SourceUpdate(
      source: String, rev: Long, n_docs: Long, sum_score: Long, n_sel: Long)

  /** Scan-side per-doc score — c11's exact integer pipeline as a local
    * loop (tokenize → charfold bucket → weight → mean in basis points).
    * Returns (n_tok, score_bp). */
  def score(text: String,
      weights: Map[Long, Long], nt: Long, nr: Long): (Long, Long) = {
    val b = graft.queries.Curation.DsirBuckets
    val unseen = Math.floorDiv((nr + b) * 10000L, nt + b)
    // Spark semantics exactly (ADVICE r14 — this loop is parity-pinned
    // against the batch pipeline): Spark's `trim` drops only ' ' at the
    // ends (Java String.trim drops all chars <= U+0020) and `lower` is
    // locale-independent (default-locale toLowerCase breaks on e.g. tr_TR
    // dotted-I) — match RefreshedSelectionSpec.tokensOf.
    // limit -1: Spark's split keeps trailing empty tokens (Java's
    // zero-limit split drops them) — a doc ending in non-space whitespace
    // must bucket the same "" token the batch explode sees.
    val trimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = trimmed.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    var sw = 0L
    var i = 0
    while (i < toks.length) {
      val bk = graft.functions.CharFoldKernel.fold(
        UTF8String.fromString(toks(i))) % b
      sw += weights.getOrElse(bk, unseen)
      i += 1
    }
    (toks.length.toLong, Math.floorDiv(sw, toks.length.toLong))
  }

  /** @param selFloorBp documents scoring at or above this mean-ratio
    *   floor count as SELECTED (10000 = "as target-like as the average
    *   target token is likely" — the natural acceptance bar). */
  def monitor(docs: Dataset[DocEv],
      weights: Map[Long, Long], nt: Long, nr: Long,
      selFloorBp: Long = 10000L)(
      implicit spark: SparkSession): Dataset[SourceUpdate] = {
    import spark.implicits._
    require(weights.nonEmpty, "graft: live DSIR scorer needs a trained weight export")
    val target = graft.queries.Curation.DsirTarget
    docs
      .filter((d: DocEv) => d.text != null && d.text.nonEmpty &&
        d.source != null && d.source != target)
      .map { d =>
        val (_, s) = score(d.text, weights, nt, nr)
        (d.source, s)
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[SrcState, SourceUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[(String, Long)], state: GroupState[SrcState]) =>
          val prev = state.getOption
          var n = prev.fold(0L)(_.nDocs)
          var sum = prev.fold(0L)(_.sumScore)
          var sel = prev.fold(0L)(_.nSel)
          var saw = false
          batch.foreach { case (_, s) =>
            saw = true; n += 1L; sum += s
            if (s >= selFloorBp) sel += 1L
          }
          if (saw) {
            val next = SrcState(prev.fold(1L)(_.rev + 1L), n, sum, sel)
            state.update(next)
            Iterator(SourceUpdate(src, next.rev, n, sum, sel))
          } else Iterator.empty
      }
  }

  /** Per-source acceptance report over a live update relation:
    * (source, n_docs, mean_score_bp, n_sel), newest rev per source. */
  def reportOf(updates: DataFrame): DataFrame =
    updates
      .groupBy(col("source"))
      .agg(max_by(struct(col("n_docs"), col("sum_score"), col("n_sel")),
        col("rev")).as("u"))
      .select(col("source"), col("u.n_docs").as("n_docs"),
        expr("u.sum_score div u.n_docs").as("mean_score_bp"),
        col("u.n_sel").as("n_sel"))
      .orderBy(col("source"))
}
