package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}

/** t16's scaladoc claims natural-language bigram-head skew (Zipf: "the"
  * heads a large share of all bigrams) cannot hurt it, for two concrete
  * mechanisms.  This spec PLANTS that skew (one head ≈ 40% of corpus
  * bigram mass — far beyond real Zipf) and measures both:
  *   1. map-side combine: the count aggregations' shuffles stay EVEN —
  *      the hot key reaches its reducer as partial rows (≤ one per map
  *      task), so the planted 40% mass is invisible in the exchange's
  *      per-partition bytes;
  *   2. broadcast joins-back: the aggregated count relations broadcast,
  *      so the fact side is never re-shuffled and no reducer ever owns
  *      the hot head (BroadcastHashJoin ×2, SortMergeJoin ×0);
  * and pins the fallback: with broadcast disabled (vocab-outgrows-
  * broadcast scenario) the SMJ plan returns identical results — slower,
  * skew-exposed (AQE's OptimizeSkewedJoin structurally cannot split a
  * join over a fused aggregate), which is exactly why the scaladoc
  * names SALTING, not skew-split, as the degradation path. */
class T16SkewSpec extends SparkSpec {

  private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** 20k docs × 21 words; 80% of docs interleave "the" at every other
    * position → "the" heads ≈40% of corpus bigrams.  Rest uniform over a
    * 500-word vocab. */
  private def writeHotCorpus(dir: String): Unit = {
    val s = spark
    import s.implicits._
    val rows = (0 until 20000).map { id =>
      val words = (0 until 21).map { j =>
        val u = math.abs(mix(id.toLong * 131 + j)) % 500
        if (id % 5 < 4 && j % 2 == 1) "the" else s"w$u"
      }
      val text = words.mkString(" ")
      (id.toLong, text, "en", s"s${id % 3}", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** All materialized shuffle stages' per-partition byte arrays. */
  private def shuffleStats(df: DataFrame): Seq[Array[Long]] = {
    val out = Seq.newBuilder[Array[Long]]
    def walk(p: SparkPlan): Unit = p match {
      case s: ShuffleQueryStageExec =>
        s.mapStats.foreach(st => out += st.bytesByPartitionId)
        walk(s.plan)
      case q: QueryStageExec => walk(q.plan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _ => p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    out.result()
  }

  private def occurrences(plan: String, marker: String): Int =
    plan.sliding(marker.length).count(_ == marker)

  test("planted 40%-mass bigram head: even count shuffles, broadcast joins-back, SMJ fallback identical") {
    val dir = java.nio.file.Files.createTempDirectory("t16-hot").toString
    writeHotCorpus(dir)

    // production confs (session defaults: AQE + auto-broadcast on)
    val df = TextOps.t16BigramSurprisal.fn(spark, dir)
    val rows = df.collect().map(_.toString).toSeq.sorted
    val plan = df.queryExecution.executedPlan.toString

    // mechanism 2: both count joins broadcast; the fact relation is
    // never re-shuffled on a skewable key
    assert(occurrences(plan, "BroadcastHashJoin") >= 2,
      s"count joins did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "unexpected SMJ in production shape")

    // mechanism 1: every shuffle whose input saw the 40%-mass key is
    // map-side combined — no partition may carry a skewed share.  The
    // remaining shuffles here are the partial-agg outputs and tiny
    // rollups; bound max/mean ≤ 2 across all of them.
    val stats = shuffleStats(df).filter(_.sum > 0)
    assert(stats.nonEmpty, "no materialized shuffle stats found")
    stats.foreach { bytes =>
      val mean = bytes.sum.toDouble / bytes.length
      val worst = bytes.max / mean
      assert(worst <= 2.0,
        s"skewed shuffle survived map-side combine: ${bytes.mkString(",")}")
    }

    // fallback: broadcast disabled (vocab too big) → SMJ plan, same rows
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prior = confs.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach(spark.conf.set(_, "-1"))
      val df2 = TextOps.t16BigramSurprisal.fn(spark, dir)
      val rows2 = df2.collect().map(_.toString).toSeq.sorted
      assert(df2.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      assert(rows2 == rows, "SMJ fallback changed t16 results")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
