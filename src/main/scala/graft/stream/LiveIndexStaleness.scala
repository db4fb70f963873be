package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live IVF index-staleness monitor — batch `s13_index_staleness`'s
  * streaming twin (round-10 verdict #7), completing the monitor-family
  * parity table: a production IVF index is trained once on the archive
  * and then serves a STREAM of new vectors, and the "when to retrain"
  * statistics (per-cell occupancy and distance drift) should update as
  * the vectors arrive, not on a nightly rescan.
  *
  * Shape: the trained index is a driver-side value ([[graft.queries
  * .Similarity.s13IndexArray]] — 10 cells × 64 dims, exactly how a
  * consumer loads a stored index), each incoming vector computes its
  * nearest-trained-centroid assignment SCAN-SIDE (the same exact
  * integer-grid arithmetic as the batch audit: quantize to the
  * floor(x·64) grid, FAISS IVF metric v·v − 2·v·c + c·c, ties to the
  * lowest list_id), and a per-CELL `flatMapGroupsWithState` folds the
  * incoming occupancy count and integer distance mass.  Both folds are
  * plain integer SUMS — commutative and associative, so like the live
  * funnel's min-fold the monitor needs NO watermark and no event-time
  * ordering; exactly-once across restarts comes from the checkpointed
  * state store, proven by the parity spec's mid-stream restart.  State
  * is 3 longs per CELL (not per vector) — bounded by the index size,
  * the whole point of a staleness monitor.
  *
  * Emission contract (Append mode): one [[CellUpdate]] per cell per
  * batch in which the cell received vectors, `rev`-chained so consumers
  * take each cell's latest record with `max_by(..., rev)` (the
  * LiveFunnel convention).  [[reportOf]] joins the latest live counters
  * with the STORED archive side ([[graft.queries.Similarity
  * .s13ArchiveCellStats]] — maintained with the index at scale, never
  * recomputed per event) and applies the batch audit's own
  * cross-multiplied shift expressions, so live and batch can only
  * disagree if the per-cell counters disagree — which
  * IndexStalenessParitySpec checks first, restart included. */
object LiveIndexStaleness {

  /** An incoming vector (the d14 "today's crawl" slice, one event per
    * vector). */
  final case class VEv(vec_id: Long, emb: Array[Double])

  /** Per-cell running counters; dInc is the exact integer distance mass
    * (each per-vector distance is an exact integer on the quantized
    * grid, so summing longs replays the batch sum-then-cast exactly). */
  final case class CellState(rev: Long, nInc: Long, dInc: Long)

  final case class CellUpdate(list_id: Int, rev: Long, n_inc: Long, d_inc: Long)

  /** Scan-side nearest-trained-centroid assignment — the same exact
    * arithmetic as the batch `s13Nearest` (all operands are integers
    * represented in doubles, magnitudes ≪ 2⁵³, so fold order is
    * irrelevant and the result is bit-exact): returns (list_id,
    * integer distance). */
  def assign(emb: Array[Double],
      index: Array[(Int, Array[Double], Double)]): (Int, Long) = {
    val scale = graft.queries.Similarity.QuantScale.toDouble
    val qv = new Array[Double](emb.length)
    var vv = 0.0
    var i = 0
    while (i < emb.length) {
      qv(i) = math.floor(emb(i) * scale)
      vv += qv(i) * qv(i)
      i += 1
    }
    var bestId = Int.MaxValue
    var bestD = Double.PositiveInfinity
    index.foreach { case (id, cent, cc) =>
      var dp = 0.0
      var j = 0
      val n = math.min(qv.length, cent.length)
      while (j < n) { dp += qv(j) * cent(j); j += 1 }
      val d = vv - 2.0 * dp + cc
      if (d < bestD || (d == bestD && id < bestId)) { bestD = d; bestId = id }
    }
    (bestId, bestD.toLong)
  }

  def monitor(vectors: Dataset[VEv],
      index: Array[(Int, Array[Double], Double)])(
      implicit spark: SparkSession): Dataset[CellUpdate] = {
    import spark.implicits._
    require(index.nonEmpty, "graft: live staleness monitor needs a trained index")
    vectors
      // a null/empty embedding belongs to no cell (a production feed
      // validates upstream; silently inventing an assignment would skew
      // the very statistic this monitor exists for)
      .filter((v: VEv) => v.emb != null && v.emb.nonEmpty)
      .map(v => assign(v.emb, index))
      .groupByKey(_._1)
      .flatMapGroupsWithState[CellState, CellUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cell: Int, batch: Iterator[(Int, Long)], state: GroupState[CellState]) =>
          val prev = state.getOption
          var n = prev.fold(0L)(_.nInc)
          var d = prev.fold(0L)(_.dInc)
          var saw = false
          batch.foreach { case (_, dist) => saw = true; n += 1L; d += dist }
          if (saw) {
            val next = CellState(prev.fold(1L)(_.rev + 1L), n, d)
            state.update(next)
            Iterator(CellUpdate(cell, next.rev, n, d))
          } else Iterator.empty
      }
  }

  /** s13's per-cell staleness report over a live update relation: reduce
    * to each cell's LATEST counters (max rev), full-outer-join the
    * stored archive stats (a cell can be archive-only — no incoming yet —
    * or incoming-only — new data found a region the index never saw),
    * and apply the batch audit's own cross-multiplied shift expressions.
    * The expressions are stated ONCE here and once in the oracled batch
    * query, and the parity spec pins them equal. */
  def reportOf(updates: DataFrame, archiveStats: DataFrame): DataFrame = {
    val latest = updates
      .groupBy(col("list_id"))
      .agg(max_by(struct(col("n_inc"), col("d_inc")), col("rev")).as("u"))
      .select(col("list_id"), col("u.n_inc").as("n_inc"),
        col("u.d_inc").as("d_inc"))
    val per = archiveStats.join(latest, Seq("list_id"), "full_outer")
      .select(col("list_id"),
        coalesce(col("n_arch"), lit(0L)).as("n_arch"),
        coalesce(col("n_inc"), lit(0L)).as("n_inc"),
        coalesce(col("d_arch"), lit(0L)).as("d_arch"),
        coalesce(col("d_inc"), lit(0L)).as("d_inc"))
    val tot = per.agg(sum(col("n_arch")).as("t_arch"), sum(col("n_inc")).as("t_inc"))
    per.crossJoin(broadcast(tot))
      .select(col("list_id"), col("n_arch"), col("n_inc"),
        col("d_arch"), col("d_inc"),
        (col("n_inc") * col("t_arch") - col("n_arch") * col("t_inc")).as("occ_shift_x"),
        (col("d_inc") * col("n_arch") - col("d_arch") * col("n_inc")).as("dist_shift_x"))
      .orderBy(col("list_id"))
  }
}
