package graft.functions

import graft.SparkSpec
import graft.sentiment.GraftFunctions
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees on a PLANTED Zipfian stream — the skew
  * case the sketch exists for (a10's oracle pins the arithmetic on the
  * near-uniform events table; this pins the PROBABILISTIC contract where
  * it matters): no under-estimation ever, over-estimation within the
  * ε·N bound, true heavy hitters recovered by estimate ranking, and the
  * monoid merge is partition-count-invariant. */
class CmsSpec extends SparkSpec {

  private val P = 1000000007L
  private val D = 3
  private val W = 256
  // same splitmix64 recipe as the query constants, local seeds
  private def mix64(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }
  private val as = (0 until D).map(i => math.floorMod(mix64(0xC100L + i), P - 1) + 1)
  private val bs = (0 until D).map(i => math.floorMod(mix64(0xC200L + i), P))

  // Zipf(1): key k ∈ [1, 400] appears ⌈2000/k⌉ times — head key 1 has
  // 2000 occurrences, the tail ~5; N ≈ 2000·H(400) ≈ 13k.
  private val keys: Seq[Long] =
    (1 to 400).flatMap(k => Seq.fill(math.ceil(2000.0 / k).toInt)(k.toLong))
  private val trueCounts: Map[Long, Long] =
    keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def estimates(nPartitions: Int): Map[Long, Long] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    def bucket(i: Int) = ((col("k") % P) * as(i) + bs(i)) % P % W
    val sketch = keys.toDF("k").repartition(nPartitions)
      .agg(call_function("graft_cms",
        array((0 until D).map(bucket): _*), lit(W)).as("cms"))
    val est = (0 until D).map(i =>
      element_at(col("cms"), (bucket(i) + lit(i * W) + lit(1)).cast("int")))
    trueCounts.keys.toSeq.toDF("k")
      .crossJoin(broadcast(sketch))
      .select(col("k"), least(est: _*).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CMS never under-estimates and overshoot stays within the ε·N bound") {
    val est = estimates(nPartitions = 4)
    val n = keys.size.toLong
    // ε = e/W ⇒ bound ≈ 2.72/256 · N ≈ 0.0106·N; allow the full bound,
    // which the d=3 min should beat easily (failure prob (1/2)^3 per key
    // at ε·N, and these constants are fixed — this is deterministic).
    val bound = (math.E / W * n).toLong + 1
    trueCounts.foreach { case (k, t) =>
      assert(est(k) >= t, s"under-estimate for key $k: est ${est(k)} < true $t")
      assert(est(k) <= t + bound,
        s"key $k overshoot ${est(k) - t} above eps*N bound $bound")
    }
  }

  test("estimate ranking recovers the true Zipf head (top-10 exact)") {
    val est = estimates(nPartitions = 4)
    val trueTop = trueCounts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).map(_._1)
    val estTop = est.toSeq.sortBy { case (k, c) => (-c, k) }.take(10).map(_._1)
    // Zipf head counts (2000, 1000, 667, …) tower over the ~εN ≈ 140
    // collision noise, so the head ranking must survive the sketch
    assert(estTop == trueTop,
      s"sketch ranking lost the Zipf head: est $estTop vs true $trueTop")
  }

  test("sketch is partition-count-invariant (commutative-monoid merge)") {
    val one = estimates(nPartitions = 1)
    val many = estimates(nPartitions = 13)
    assert(one == many, "partial/merge split changed the sketch")
  }

  test("empty input yields an empty sketch array; null buckets are skipped") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val empty = Seq.empty[Long].toDF("k")
      .agg(call_function("graft_cms", array(lit(0L), lit(1L)), lit(W)).as("cms"))
      .head().getSeq[Long](0)
    assert(empty.isEmpty, "empty group should evaluate to the empty buffer")
    val withNull = Seq(Some(1L), None, Some(2L)).toDF("k")
      .agg(call_function("graft_cms",
        when(col("k").isNotNull, array(col("k") % W)).otherwise(lit(null)),
        lit(W)).as("cms"))
      .head().getSeq[Long](0)
    assert(withNull.sum == 2L, s"null row should not count: ${withNull.sum}")
  }
}
