package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c9's share arithmetic must stay exact past the point where the naive
  * `(budget * weight) div sum_w` product crosses 2^63 (total tokens
  * T ≳ 7e12 — inside the 100 TB envelope).  Pins the decomposed form
  * `(budget div sum_w)*weight + ((budget % sum_w)*weight) div sum_w`
  * (the expression Curation.c9 ships) against a BigInt reference on
  * planted near-overflow operands, and proves the naive product really
  * is unrepresentable there (`try_multiply` → NULL; with ANSI on the
  * naive form would abort the whole query at runtime, with ANSI off it
  * would wrap silently — either way the query dies or lies at scale
  * without the decomposition). */
class ShareOverflowSpec extends SparkSpec {

  // (budget, weight, sum_w) — weight ≤ sum_w in every row, as in c9.
  private val cases: Seq[(Long, Long, Long)] = Seq(
    // ADVICE scenario: T = 1e13 tokens, dominant source.
    (5_000_000_000_000L, 3_162_277L, 4_000_000L),
    // budget near Long.MaxValue, balanced weights.
    (Long.MaxValue / 2, 1_000_003L, 7_000_021L),
    // weight == sum_w (single source takes the whole budget).
    (9_000_000_000_000_000_000L, 123_456_789L, 123_456_789L),
    // tiny in-range values (regression: decomposition == naive here).
    (1000L, 3L, 7L),
    (0L, 5L, 9L),
    (17L, 0L, 4L))

  test("decomposed share matches BigInt reference; naive product overflows") {
    val s = spark
    import s.implicits._
    val df = cases.toDF("budget", "weight", "sum_w")
      .withColumn("share", expr(
        "(budget div sum_w) * weight + ((budget % sum_w) * weight) div sum_w"))
      .withColumn("naive_prod", expr("try_multiply(budget, weight)"))
    val rows = df.collect()
    var sawOverflow = false
    rows.zip(cases).foreach { case (r, (b, w, sw)) =>
      val want = (BigInt(b) * BigInt(w) / BigInt(sw)).toLong
      assert(r.getAs[Long]("share") === want,
        s"decomposed share wrong for ($b, $w, $sw)")
      if (BigInt(b) * BigInt(w) > BigInt(Long.MaxValue)) {
        sawOverflow = true
        assert(r.isNullAt(r.fieldIndex("naive_prod")),
          s"expected naive product to overflow for ($b, $w, $sw)")
      } else {
        assert(r.getAs[Long]("naive_prod") === (b * w),
          s"in-range naive product mismatch for ($b, $w, $sw)")
      }
    }
    assert(sawOverflow, "fixture must include at least one naive-overflow row")
  }

  test("c9 end-to-end on sf0.001 stays on the integer grid") {
    val out = Curation.c9TemperatureMixing.fn(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val share = r.getAs[Long]("share_tokens")
      val avail = r.getAs[Long]("avail_tokens")
      val rate = r.getAs[Long]("rate_bp")
      assert(share >= 0L && rate >= 0L && rate <= 10000L)
      assert(r.getAs[Long]("planned_tokens") <= avail)
    }
  }
}
