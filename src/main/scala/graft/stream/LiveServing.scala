package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live retrieval through the EXECUTED IVF index — batch
  * `s18_refreshed_serving`'s streaming twin (T22), extending the
  * serve-again loop to the serving tier itself: a serving node loads
  * the index c16's verdict shipped
  * ([[graft.queries.Similarity.servingIndexExport]] — a ≤ k-cell
  * driver-side value, the s13IndexArray deployment pattern), queries
  * arrive as a STREAM, each query computes its nprobe probe cells
  * SCAN-SIDE (the batch probe's exact integer arithmetic: floor(x·64)
  * grid, FAISS metric v·v − 2·v·c + c·c, ties to the lowest list_id),
  * candidates come from the STATIC posting-list relation via a
  * stream-static equi-join on list_id (at 100 TB the stored posting
  * lists ARE this relation, partitioned by list_id — the join touches
  * only the probed cells' partitions), the exact round-4 cosine
  * re-ranks (the batch expressions verbatim — [[postingsOf]] rides
  * `Similarity.embGridOf`/`postingListsOf`, the SAME builders s18's
  * lists ride, so live ≡ batch holds by construction), and a per-QUERY
  * `flatMapGroupsWithState` folds the running top-[[TopK]].
  *
  * The fold is a bounded ORDER STATISTIC (keep the 5 best by
  * (cosine desc, nn_id)): commutative-idempotent over candidate sets,
  * so like the funnel's min-fold it needs no watermark — a re-sent
  * query or a candidate arriving in a later batch (a posting-list
  * partition backfill) merges into the same top-k, and exactly-once
  * across restarts is the checkpointed state store's job.  That
  * later-batch merge holds only while the query's state LIVES:
  * with `stateTtlMs > 0`, a candidate batch arriving more than the
  * TTL after the previous one finds the state evicted and starts a
  * fresh rev chain whose top-k silently misses the earlier
  * candidates — so the TTL MUST exceed the maximum candidate-delivery
  * spread (any posting-backfill window included); size it as an
  * answered-and-idle horizon, not a batch interval (ADVICE r14).
  * State is
  * ≤ TopK (cosine, id) pairs per LIVE query, and — unlike the monitor
  * twins, whose key spaces are bounded by the model — retrieval
  * request ids are one-shot, so a long-running node enables the
  * answered-state TTL (`stateTtlMs` with a paced trigger — see
  * [[serve]]) to evict them (review r14); a request re-sent after
  * eviction recomputes the same answer from the static postings
  * (fresh rev chain).
  *
  * Self-exclusion is EXPLICIT (review r14): the batch s18 drops
  * `vec_id == q_id` because its queries ARE corpus vectors; a live
  * request id is arbitrary, so [[QEv.exclude_id]] (default −1 = none)
  * says which corpus vector, if any, is the query itself — the parity
  * spec passes the corpus vec_id, a deployment with synthetic request
  * ids leaves the default and can legitimately receive ANY vector.
  *
  * Emission contract (Append mode): one [[ServeUpdate]] per query per
  * batch in which the query gained candidates, `rev`-chained;
  * consumers take the latest per query (`max_by(…, rev)` — the
  * LiveFunnel convention), which [[reportOf]] flattens to the batch
  * s18 row shape `(q_id, rn, nn_id, cosine, verdict)`.
  * LiveServingParitySpec pins live ≡ batch on the real corpus, chunked
  * replay, re-sent queries and TTL eviction included. */
object LiveServing {

  /** A retrieval request: query id + embedding, plus the corpus vector
    * this query IS, if any (−1 = none; see the self-exclusion note). */
  final case class QEv(q_id: Long, emb: Array[Double], exclude_id: Long = -1L)

  /** Running per-query top-k: rev-chained, ordered by
    * (cosine desc, nn_id). */
  final case class TopState(rev: Long, cosines: Seq[Double], nnIds: Seq[Long])

  final case class ServeUpdate(q_id: Long, rev: Long,
      nn_ids: Seq[Long], cosines: Seq[Double])

  val TopK = 5

  /** The query's nprobe nearest serving cells, scan-side — the same
    * exact integer arithmetic as the batch probe (every operand an
    * integer in a double, magnitudes ≪ 2⁵³: fold order irrelevant,
    * result bit-exact; ties break to the lowest list_id). */
  def probeCells(emb: Array[Double],
      index: Array[(Int, Array[Double], Double)],
      nprobe: Int): Seq[Int] = {
    val scale = graft.queries.Similarity.QuantScale.toDouble
    val qv = new Array[Double](emb.length)
    var vv = 0.0
    var i = 0
    while (i < emb.length) {
      qv(i) = math.floor(emb(i) * scale)
      vv += qv(i) * qv(i)
      i += 1
    }
    index.map { case (id, cent, cc) =>
      // dimension mismatch = malformed query embedding; a truncated dot
      // product would serve wrong probe cells silently (index dims are
      // uniform by construction, so this can only be the query's fault)
      require(cent.length == qv.length,
        s"graft: query embedding dim ${qv.length} != index dim ${cent.length}")
      var dp = 0.0
      var j = 0
      while (j < qv.length) { dp += qv(j) * cent(j); j += 1 }
      (vv - 2.0 * dp + cc, id)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq
  }

  /** The static posting-list relation under an exported serving index —
    * `(list_id, vec_id, emb, nrm)`.  At scale this is the STORED
    * relation maintained with the index (d14's stored-index story); the
    * twin derives it through the SAME `Similarity.embGridOf` +
    * `postingListsOf` builders s18's batch lists ride, so parity holds
    * by construction.  One corpus scan, one broadcast argmin — no
    * corpus shuffle. */
  def postingsOf(corpus: DataFrame,
      index: Array[(Int, Array[Double], Double)])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val idxDf = index.toSeq.map { case (l, c, cc) => (l, c.toSeq, cc) }
      .toDF("list_id", "cent", "cc")
    graft.queries.Similarity.postingListsOf(
        graft.queries.Similarity.embGridOf(corpus), idxDf)
      .withColumn("nrm", graft.queries.Similarity.norm(col("emb")))
      .select(col("list_id"), col("vec_id"), col("emb"), col("nrm"))
  }

  /** The live serving pipeline: probe scan-side, candidates from the
    * static postings (stream-static equi-join on list_id), batch-exact
    * round-4 cosine, per-query top-k fold.
    *
    * `stateTtlMs > 0` enables answered-state EVICTION on a
    * processing-time timeout (the review-r14 state-growth fix — one-shot
    * request keys never revisit, so without a TTL a long-running node
    * accumulates one TopState per request forever).  A TTL'd query MUST
    * run with a paced processing-time trigger: registered timeouts make
    * a zero-interval trigger run continuous no-data micro-batches (each
    * committing every state partition), which is a checkpoint-churn
    * storm, not eviction.  Harness note: a ProcessingTimeTimeout stream
    * always constructs another batch, so `processAllAvailable` never
    * returns on it — poll the sink instead (the TTL parity test shows
    * the shape).  The default 0 keeps NoTimeout — right for parity
    * replays and bounded soaks.  TTL sizing contract (class doc): the
    * TTL bounds how LATE a candidate batch may arrive and still merge
    * into the query's existing top-k — past it, eviction makes the next
    * batch a fresh, PARTIAL rev chain.  Pick
    * stateTtlMs > max candidate-delivery spread (backfills included). */
  def serve(queries: Dataset[QEv],
      index: Array[(Int, Array[Double], Double)],
      postings: DataFrame,
      nprobe: Int = graft.queries.Similarity.IvfProbe,
      stateTtlMs: Long = 0L,
      droppedQueries: Option[org.apache.spark.util.LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[ServeUpdate] = {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    require(index.nonEmpty, "graft: live serving needs a serving index")
    val dot = graft.queries.Similarity.dot _
    val dim = index.head._2.length
    // `dim` is read off the FIRST centroid and gates the poison-pill
    // filter below — a ragged index would silently admit queries of
    // whichever dimension happened to come first (ADVICE r16), so fail
    // construction loudly instead (k centroids, a driver-side check)
    require(index.forall(_._2.length == dim),
      s"graft: serving index centroids disagree on dimension " +
        s"(${index.map(_._2.length).distinct.sorted.mkString("/")}) — rebuild the index")
    val probed = queries
      // a MALFORMED query (null/empty/wrong-dimension embedding) is
      // DROPPED at ingest, not crashed on: probeCells' dimension
      // `require` would fail the task, kill the stream, and — because
      // the checkpointed source replays the same event on restart —
      // crash-loop the serving node on one poison-pill request forever
      // (ADVICE r15).  Dropping is safe (an invented/truncated
      // assignment would serve WRONG neighbors silently; absence is the
      // honest answer), and a deployment wanting dead-letters routes
      // `!wellFormed(q)` to a side sink with this same predicate.
      // `droppedQueries` makes the drops OBSERVABLE: a producer-side
      // dimension change silently zeroing ALL traffic is otherwise
      // indistinguishable from no traffic — alarm on the counter
      // outpacing answered queries.  The increment rides a filter
      // closure, so task retries/speculation replay it (ADVICE r16):
      // the count is an at-least-once UPPER bound, and the alarm
      // condition (`> 0`, or the rate outpacing answers) only gets
      // more sensitive from over-counting; zero stays exact.
      .filter { (q: QEv) =>
        val ok = q.emb != null && q.emb.length == dim
        if (!ok) droppedQueries.foreach(_.add(1L))
        ok
      }
      .flatMap(q => probeCells(q.emb, index, nprobe)
        .map(l => (q.q_id, l, q.emb, q.exclude_id)))
      .toDF("q_id", "list_id", "qe", "exclude_id")
      .withColumn("qn", graft.queries.Similarity.norm(col("qe")))
    val cands = probed.join(postings, Seq("list_id"))
      .filter(col("vec_id") =!= col("exclude_id"))
      .withColumn("cosine",
        round(dot(col("qe"), col("emb")) / (col("qn") * col("nrm")), 4))
      .select(col("q_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)]
    val timeoutConf =
      if (stateTtlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    cands.groupByKey(_._1)
      .flatMapGroupsWithState[TopState, ServeUpdate](
        OutputMode.Append, timeoutConf) {
        (qid: Long, batch: Iterator[(Long, Long, Double)], state: GroupState[TopState]) =>
          if (stateTtlMs > 0L && state.hasTimedOut) {
            // one-shot request answered and idle past the TTL: evict —
            // this is what keeps state serving-window-sized
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
            val merged = (prev.fold(Seq.empty[(Double, Long)])(s =>
                s.cosines.zip(s.nnIds)) ++
                batch.map { case (_, nn, cos) => (cos, nn) })
              // idempotent under re-delivery: the static corpus gives a
              // re-sent query the same (cosine, id) pairs — dedupe, then
              // keep the k best by (cosine desc, nn_id)
              .distinct
              .sortBy { case (cos, nn) => (-cos, nn) }
              .take(TopK)
            val next = TopState(prev.fold(1L)(_.rev + 1L),
              merged.map(_._1), merged.map(_._2))
            state.update(next)
            if (stateTtlMs > 0L) state.setTimeoutDuration(stateTtlMs)
            Iterator(ServeUpdate(qid, next.rev, next.nnIds, next.cosines))
          }
      }
  }

  /** Latest top-k per query, flattened to the batch s18 row shape
    * `(q_id, rn, nn_id, cosine, verdict)` — the verdict is the
    * export's (the serving node knows which index it loaded). */
  def reportOf(updates: DataFrame, verdict: String): DataFrame =
    updates
      .groupBy(col("q_id"))
      .agg(max_by(struct(col("nn_ids"), col("cosines")), col("rev")).as("u"))
      .select(col("q_id"), col("u.nn_ids").as("nn_ids"),
        col("u.cosines").as("cosines"))
      .select(col("q_id"),
        posexplode(arrays_zip(col("nn_ids"), col("cosines"))).as(Seq("i", "z")))
      .select(col("q_id"), (col("i") + 1).cast("int").as("rn"),
        col("z.nn_ids").as("nn_id"), col("z.cosines").as("cosine"),
        lit(verdict).as("verdict"))
      .orderBy(col("q_id"), col("rn"))
}
