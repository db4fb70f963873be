package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live PQ codebook-staleness monitor — batch `s14_pq_staleness`'s
  * streaming twin, [[LiveIndexStaleness]]'s fine-level sibling: the
  * stored per-subspace codebooks load as a driver-side value
  * ([[graft.queries.Similarity.s14CodebookArray]] — PqM·PqK = 128 rows
  * × 8 dims), each incoming vector computes its per-subspace
  * quantization error SCAN-SIDE (the batch audit's exact integer-grid
  * arithmetic), and a per-SUBSPACE `flatMapGroupsWithState` folds the
  * incoming count and integer error mass.  Sums are commutative —
  * no watermark, no event-time ordering (the LiveFunnel argument);
  * state is 3 longs per SUBSPACE (PqM rows total).  Emission and
  * report contracts are [[LiveIndexStaleness]]'s verbatim:
  * `rev`-chained [[SubspaceUpdate]]s, `max_by(rev)` consumers, and
  * [[reportOf]] joining the stored archive side
  * ([[graft.queries.Similarity.s14ArchiveSubspaceStats]]) with s14's
  * own cross-multiplied shift expression —
  * PqStalenessParitySpec pins live ≡ oracle-checked batch, restart
  * included. */
object LivePqStaleness {

  import LiveIndexStaleness.VEv

  final case class SubState(rev: Long, nInc: Long, errInc: Long)

  final case class SubspaceUpdate(m: Int, rev: Long, n_inc: Long, err_inc: Long)

  /** Scan-side per-subspace quantization error — the batch `s14Assign`
    * arithmetic (exact integers in doubles, fold order irrelevant):
    * returns one (m, error) per subspace of the vector. */
  def assign(emb: Array[Double],
      codebooks: Array[(Int, Int, Array[Double], Double)]): Seq[(Int, Long)] = {
    val scale = graft.queries.Similarity.QuantScale.toDouble
    val pqD = graft.queries.Similarity.PqD
    val qv = emb.map(x => math.floor(x * scale))
    val byM = codebooks.groupBy(_._1)
    byM.keys.toSeq.sorted.map { m =>
      val d0 = m * pqD
      val sv = qv.slice(d0, d0 + pqD)
      var svv = 0.0
      var i = 0
      while (i < sv.length) { svv += sv(i) * sv(i); i += 1 }
      var bestD = Double.PositiveInfinity
      byM(m).foreach { case (_, _, cent, cc) =>
        var dp = 0.0
        var j = 0
        val n = math.min(sv.length, cent.length)
        while (j < n) { dp += sv(j) * cent(j); j += 1 }
        val d = svv - 2.0 * dp + cc
        if (d < bestD) bestD = d
      }
      (m, bestD.toLong)
    }
  }

  def monitor(vectors: Dataset[VEv],
      codebooks: Array[(Int, Int, Array[Double], Double)])(
      implicit spark: SparkSession): Dataset[SubspaceUpdate] = {
    import spark.implicits._
    require(codebooks.nonEmpty, "graft: live PQ monitor needs trained codebooks")
    vectors
      .filter((v: VEv) => v.emb != null && v.emb.nonEmpty)
      .flatMap(v => assign(v.emb, codebooks))
      .groupByKey(_._1)
      .flatMapGroupsWithState[SubState, SubspaceUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (m: Int, batch: Iterator[(Int, Long)], state: GroupState[SubState]) =>
          val prev = state.getOption
          var n = prev.fold(0L)(_.nInc)
          var err = prev.fold(0L)(_.errInc)
          var saw = false
          batch.foreach { case (_, e) => saw = true; n += 1L; err += e }
          if (saw) {
            val next = SubState(prev.fold(1L)(_.rev + 1L), n, err)
            state.update(next)
            Iterator(SubspaceUpdate(m, next.rev, n, err))
          } else Iterator.empty
      }
  }

  /** s14's per-subspace report over a live update relation (the
    * [[LiveIndexStaleness.reportOf]] shape with s14's expression). */
  def reportOf(updates: DataFrame, archiveStats: DataFrame): DataFrame = {
    val latest = updates
      .groupBy(col("m"))
      .agg(max_by(struct(col("n_inc"), col("err_inc")), col("rev")).as("u"))
      .select(col("m"), col("u.n_inc").as("n_inc"), col("u.err_inc").as("err_inc"))
    archiveStats.join(latest, Seq("m"), "full_outer")
      .select(col("m"),
        coalesce(col("n_arch"), lit(0L)).as("n_arch"),
        coalesce(col("n_inc"), lit(0L)).as("n_inc"),
        coalesce(col("err_arch"), lit(0L)).as("err_arch"),
        coalesce(col("err_inc"), lit(0L)).as("err_inc"))
      .select(col("m"), col("n_arch"), col("n_inc"),
        col("err_arch"), col("err_inc"),
        (col("err_inc") * col("n_arch") - col("err_arch") * col("n_inc"))
          .as("err_shift_x"))
      .orderBy(col("m"))
  }
}
