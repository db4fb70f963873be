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
  * re-ranks (the batch expressions verbatim — [[postingsOf]] and
  * [[serve]] build the SAME Columns s18 builds, so live ≡ batch holds
  * by construction), and a per-QUERY `flatMapGroupsWithState` folds
  * the running top-[[TopK]].
  *
  * The fold is a bounded ORDER STATISTIC (keep the 5 best by
  * (cosine desc, nn_id)): commutative-idempotent over candidate sets,
  * so like the funnel's min-fold it needs no watermark — a re-sent
  * query or a candidate arriving in a later batch (a posting-list
  * partition backfill) merges into the same top-k, and exactly-once
  * across restarts is the checkpointed state store's job.  State is
  * ≤ TopK (cosine, id) pairs per LIVE query — serving-window-sized,
  * never corpus-sized.
  *
  * Emission contract (Append mode): one [[ServeUpdate]] per query per
  * batch in which the query gained candidates, `rev`-chained;
  * consumers take the latest per query (`max_by(…, rev)` — the
  * LiveFunnel convention), which [[reportOf]] flattens to the batch
  * s18 row shape `(q_id, rn, nn_id, cosine, verdict)`.
  * LiveServingParitySpec pins live ≡ batch on the real corpus,
  * chunked replay and re-sent queries included. */
object LiveServing {

  /** A retrieval request: query id + embedding. */
  final case class QEv(q_id: Long, emb: Array[Double])

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
      var dp = 0.0
      var j = 0
      val n = math.min(qv.length, cent.length)
      while (j < n) { dp += qv(j) * cent(j); j += 1 }
      (vv - 2.0 * dp + cc, id)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq
  }

  /** The static posting-list relation under an exported serving index —
    * `(list_id, vec_id, emb, nrm)`.  At scale this is the STORED
    * relation maintained with the index (d14's stored-index story); the
    * twin derives it with the batch argmin expressions so parity holds
    * by construction.  One corpus scan, one broadcast argmin — no
    * corpus shuffle. */
  def postingsOf(corpus: DataFrame,
      index: Array[(Int, Array[Double], Double)])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val dot = graft.queries.Similarity.dot _
    val idxDf = index.toSeq.map { case (l, c, cc) => (l, c.toSeq, cc) }
      .toDF("list_id", "cent", "cc")
    val scale = graft.queries.Similarity.QuantScale
    corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("qv", transform(col("emb"),
        x => floor(x * scale)).cast("array<double>"))
      .withColumn("vv", dot(col("qv"), col("qv")))
      .crossJoin(broadcast(idxDf))
      .withColumn("dist", col("vv") - lit(2) * dot(col("qv"), col("cent")) + col("cc"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("list_id"), struct(col("dist"), col("list_id"))).as("list_id"),
        first(col("emb")).as("emb"))
      .withColumn("nrm", graft.queries.Similarity.norm(col("emb")))
      .select(col("list_id"), col("vec_id"), col("emb"), col("nrm"))
  }

  /** The live serving pipeline: probe scan-side, candidates from the
    * static postings (stream-static equi-join on list_id), batch-exact
    * round-4 cosine, per-query top-k fold. */
  def serve(queries: Dataset[QEv],
      index: Array[(Int, Array[Double], Double)],
      postings: DataFrame,
      nprobe: Int = graft.queries.Similarity.IvfProbe)(
      implicit spark: SparkSession): Dataset[ServeUpdate] = {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    require(index.nonEmpty, "graft: live serving needs a serving index")
    val dot = graft.queries.Similarity.dot _
    val probed = queries
      // a null/empty embedding probes nothing (validate upstream — an
      // invented assignment would serve wrong neighbors silently)
      .filter((q: QEv) => q.emb != null && q.emb.nonEmpty)
      .flatMap(q => probeCells(q.emb, index, nprobe).map(l => (q.q_id, l, q.emb)))
      .toDF("q_id", "list_id", "qe")
      .withColumn("qn", graft.queries.Similarity.norm(col("qe")))
    val cands = probed.join(postings, Seq("list_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        round(dot(col("qe"), col("emb")) / (col("qn") * col("nrm")), 4))
      .select(col("q_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)]
    cands.groupByKey(_._1)
      .flatMapGroupsWithState[TopState, ServeUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, batch: Iterator[(Long, Long, Double)], state: GroupState[TopState]) =>
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
          Iterator(ServeUpdate(qid, next.rev, next.nnIds, next.cosines))
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
