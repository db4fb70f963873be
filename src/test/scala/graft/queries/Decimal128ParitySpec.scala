package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The `spark.graft.decimal128` promotion path (r13 verdict #3: turn the
  * decimal(38) regime NOTE into a tested config PATH):
  *
  *   1. parity — on data where int64 does not overflow, the promoted
  *      arithmetic returns bit-identical values (integral `div` over
  *      decimal still yields bigint), both for the raw expressions and
  *      for the full c13 decision query under the conf;
  *   2. survival — on a planted overflow-scale fixture the int64 path
  *      fails correct-by-crash under ANSI while the decimal path returns
  *      the value a BigInt recount pins.
  */
class Decimal128ParitySpec extends SparkSpec {

  private def chainHasOverflow(e: Throwable): Boolean = {
    var t: Throwable = e
    var n = 0
    while (t != null && n < 12) {
      if (t.getMessage != null &&
        t.getMessage.toLowerCase.contains("overflow")) return true
      t = t.getCause
      n += 1
    }
    false
  }

  test("c13 decision: decimal128 conf returns bit-identical rows (sf0.001)") {
    val dir = sf()
    val base = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.decimal128", "true")
    try {
      val dec = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(dec == base, s"decimal path diverged:\n  int64  $base\n  dec128 $dec")
    } finally spark.conf.unset("spark.graft.decimal128")
  }

  // ------------------------------------------------- planted fixtures
  // counts chosen so every overflow-capable product EXCEEDS int64:
  // w_old's numerator (ct+1)(nr_a+B)·10⁴ ≈ 4e9·5e9·1e4 = 2·10²³ and
  // Σ|shift| = 10¹⁹ both blow past 9.2·10¹⁸
  private val B = Curation.DsirBuckets
  private def hugeSelectorPer: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, 4000000000L, 3000000000L, 1000000000L, 2000000000L),
      (1L, 1000000000L, 2000000000L, 2000000000L, 3000000000L))
      .toDF("b", "ct_arch", "cr_arch", "ct_inc", "n_inc")
  }

  /** Plain-BigInt recount of [[RefreshDecision.selectorLegOf]] on the
    * planted fixture — the third implementation for the huge regime. */
  private def bigSelectorExpected: (Long, Long) = {
    val rows = Seq(
      (BigInt(4000000000L), BigInt(3000000000L), BigInt(1000000000L), BigInt(2000000000L)),
      (BigInt(1000000000L), BigInt(2000000000L), BigInt(2000000000L), BigInt(3000000000L)))
    val ntA = rows.map(_._1).sum
    val nrA = rows.map(_._2).sum
    val tiT = rows.map(_._3).sum
    val tiR = rows.map(_._4).sum
    val bb = BigInt(B)
    val sh = rows.map { case (_, cra, _, nin) => (nin * nrA - cra * tiR).abs }.sum
    val st = BigInt(10000) * sh / (BigInt(2) * nrA * tiR)
    val dw = rows.map { case (cta, cra, cti, nin) =>
      val wOld = (cta + 1) * (nrA + bb) * 10000 / ((cra + 1) * (ntA + bb))
      val wNew = (cta + cti + 1) * (nrA + tiR + bb) * 10000 /
        ((cra + nin + 1) * (ntA + tiT + bb))
      (wNew - wOld).abs
    }.sum
    (st.toLong, (dw / rows.size).toLong)
  }

  test("selector leg: int64 crashes loudly at overflow scale, decimal128 answers") {
    val per = hugeSelectorPer
    val e = intercept[Throwable] {
      RefreshDecision.selectorLegOf(per, B).collect()
    }
    assert(chainHasOverflow(e), s"int64 path failed without 'overflow': $e")
    val got = RefreshDecision.selectorLegOf(per, B, decimal = true).collect().head
    val (wantSt, wantBen) = bigSelectorExpected
    assert(got.getLong(0) == wantSt, s"staleness: got ${got.getLong(0)} want $wantSt")
    assert(got.getLong(1) == wantBen, s"benefit: got ${got.getLong(1)} want $wantBen")
  }

  test("selector leg: decimal128 is bit-identical inside the int64 regime") {
    val s = spark
    import s.implicits._
    val per = Seq(
      (0L, 40L, 30L, 10L, 20L), (1L, 10L, 20L, 20L, 30L), (2L, 5L, 0L, 0L, 7L))
      .toDF("b", "ct_arch", "cr_arch", "ct_inc", "n_inc")
    val a = RefreshDecision.selectorLegOf(per, B).collect().head
    val b = RefreshDecision.selectorLegOf(per, B, decimal = true).collect().head
    assert(a.toSeq == b.toSeq, s"int64 $a vs dec128 $b")
  }

  test("cross staleness: overflow-scale masses crash int64, answer in decimal128") {
    val s = spark
    import s.implicits._
    // mi·na = 10¹⁰·10⁹ = 10¹⁹ > int64 even before the 10⁴ factor
    val per = Seq((1000000000L, 500000000L, 7000000000L, 10000000000L))
      .toDF("n_arch", "n_inc", "m_arch", "m_inc")
    val e = intercept[Throwable] {
      RefreshDecision.crossStalenessBp(per, "n_arch", "n_inc", "m_arch", "m_inc")
        .collect()
    }
    assert(chainHasOverflow(e), s"int64 path failed without 'overflow': $e")
    val got = RefreshDecision
      .crossStalenessBp(per, "n_arch", "n_inc", "m_arch", "m_inc", decimal = true)
      .collect().head.getLong(0)
    val want = (BigInt(10000) * BigInt(10000000000L) * BigInt(1000000000L) /
      (BigInt(7000000000L) * BigInt(500000000L)) - 10000).toLong
    assert(got == want, s"got $got want $want")
  }

  test("benefit: overflow-scale error mass crashes int64, answers in decimal128") {
    val s = spark
    import s.implicits._
    val per = Seq((1000000000000000000L, 100000000000000000L)).toDF("eb", "ea")
    val e = intercept[Throwable] {
      per.select(RefreshDecision.benefitBp("eb", "ea", decimal = false)).collect()
    }
    assert(chainHasOverflow(e), s"int64 path failed without 'overflow': $e")
    val got = per.select(RefreshDecision.benefitBp("eb", "ea", decimal = true))
      .collect().head.getLong(0)
    assert(got == 9000L, s"got $got want 9000")
  }

  test("live decisionOf: decimal flag parity on the monitors' report shapes") {
    val s = spark
    import s.implicits._
    val ivfPer = Seq((0L, 10L, 3L, 100L, 40L), (1L, 8L, 5L, 90L, 70L))
      .toDF("list_id", "n_arch", "n_inc", "d_arch", "d_inc")
    val pqPer = Seq((0L, 18L, 8L, 190L, 110L))
      .toDF("m", "n_arch", "n_inc", "err_arch", "err_inc")
    val selPer = Seq((0L, 40L, 30L, 20L), (1L, 10L, 20L, 30L))
      .toDF("b", "ct_arch", "cr_arch", "n_inc")
    val ben = graft.stream.LiveRefreshDecision.StoredBenefits(500L, 300L, 120L)
    val a = graft.stream.LiveRefreshDecision
      .decisionOf(ivfPer, pqPer, selPer, ben).collect().map(_.toSeq).toSeq
    val b = graft.stream.LiveRefreshDecision
      .decisionOf(ivfPer, pqPer, selPer, ben, decimal = true)
      .collect().map(_.toSeq).toSeq
    assert(a == b, s"live decimal path diverged:\n  $a\n  $b")
  }

  // ------------------------------------------------- auto regime (r15)
  // The conf default is now PROMOTED (decimalOn — a 100× corpus needs no
  // conf flip); the Needs checkers are the pinned-int64 preflight.

  test("default regime survives the planted overflow scale (no conf set)") {
    assert(spark.conf.getOption("spark.graft.decimal128").isEmpty)
    assert(RefreshDecision.decimalOn(spark), "unset conf must promote")
    val per = hugeSelectorPer
    val got = RefreshDecision.selectorLegOf(per, B,
      RefreshDecision.decimalOn(spark)).collect().head
    val (wantSt, wantBen) = bigSelectorExpected
    assert(got.getLong(0) == wantSt && got.getLong(1) == wantBen,
      s"default path: got (${got.getLong(0)}, ${got.getLong(1)}) " +
        s"want ($wantSt, $wantBen)")
  }

  test("preflight checkers pin the int64 boundary on both sides") {
    val s = spark
    import s.implicits._
    assert(RefreshDecision.selectorNeedsDecimal128(hugeSelectorPer, B),
      "planted overflow fixture must trip the selector bound")
    val small = Seq(
      (0L, 40L, 30L, 10L, 20L), (1L, 10L, 20L, 20L, 30L))
      .toDF("b", "ct_arch", "cr_arch", "ct_inc", "n_inc")
    assert(!RefreshDecision.selectorNeedsDecimal128(small, B))
    val hugeCross = Seq((1000000000L, 500000000L, 7000000000L, 10000000000L))
      .toDF("n_arch", "n_inc", "m_arch", "m_inc")
    assert(RefreshDecision.crossNeedsDecimal128(
      hugeCross, "n_arch", "n_inc", "m_arch", "m_inc"))
    val smallCross = Seq((1000L, 500L, 7000L, 9000L))
      .toDF("n_arch", "n_inc", "m_arch", "m_inc")
    assert(!RefreshDecision.crossNeedsDecimal128(
      smallCross, "n_arch", "n_inc", "m_arch", "m_inc"))
  }

  test("a manual conf pin overrides the promoted default") {
    val per = hugeSelectorPer
    spark.conf.set("spark.graft.decimal128", "false")
    try {
      assert(!RefreshDecision.decimalOn(spark),
        "conf false must pin int64 even at overflow scale")
      val e = intercept[Throwable] {
        RefreshDecision.selectorLegOf(per, B,
          RefreshDecision.decimalOn(spark)).collect()
      }
      assert(chainHasOverflow(e), s"pinned int64 failed without 'overflow': $e")
    } finally spark.conf.unset("spark.graft.decimal128")
    spark.conf.set("spark.graft.decimal128", "auto")
    try assert(RefreshDecision.decimalOn(spark),
      "explicit auto must behave like unset")
    finally spark.conf.unset("spark.graft.decimal128")
  }

  test("c13 under the promoted default == the pinned-int64 rows (sf0.001)") {
    val dir = sf()
    val def_ = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("spark.graft.decimal128", "false")
    try {
      val int64 = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(def_ == int64,
        s"promoted default diverged from int64:\n  dec $def_\n  i64 $int64")
    } finally spark.conf.unset("spark.graft.decimal128")
  }
}
