package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The REFRESH-DECISION arithmetic shared by the batch operator
  * (`c13_refresh_decision`) and the live composition
  * ([[graft.stream.LiveRefreshDecision]]) — the s13/s14/c12 staleness
  * audits answer "how stale is the stored model", s15 answers "what
  * would retraining buy"; these expressions turn those audits into the
  * operator a 100 TB pipeline actually schedules: "should we refresh
  * NOW, per model family".  Stated ONCE here so live ≡ batch holds by
  * construction (the selectorStalenessFromCounts / overlapFromSketches
  * discipline).
  *
  * Every metric is exact int64 basis points (the t18/c11 integer-rank
  * technique — no float crosses an engine boundary), so the whole
  * decision replays bit-for-bit in DuckDB.
  *
  * Magnitude regime — now a TESTED CONFIG PATH, not a comment (r13 nit
  * #3): the cross-multiplied staleness numerators reach 10⁴·Σdist·n ≈
  * 7·10¹⁸ at sf0.1 — inside int64 with ~25% headroom — and the selector
  * leg's w_old/w_new products grow as per-bucket-count × total-count ×
  * 10⁴, which overflows EARLIER (roughly beyond ~10⁹ total tokens with a
  * hot bucket).  Under ANSI both fail correct-by-crash.  Since round 15
  * the DEFAULT regime is PROMOTED ([[decimalOn]] — a 100× corpus needs
  * no conf flip; the promotion is free because every promoted expression
  * lives on a bounded audit relation, and the int64-vs-CASE alternatives
  * are ruled out at decimalOn's doc).  Setting
  * `spark.graft.decimal128=false` pins the int64 micro-path (preflight
  * with the Needs checkers first); `true` pins the promotion of every
  * overflow-capable product
  * (staleness cross-products, the selector shift mass and weight
  * numerators/denominators, the benefit numerators) to decimal(38,0) —
  * the integral `div` still returns bigint, so OUTPUT schemas and values
  * are identical where int64 doesn't overflow (Decimal128ParitySpec pins
  * both: parity on real data, survival on a planted overflow-scale
  * fixture).  DuckDB replays the promoted arithmetic as HUGEINT (int128
  * — the a12/a13 convention), so the decision still value-oracles when a
  * deployment flips the conf. */
object RefreshDecision {

  /** The decimal(38,0) promotion conf — see the magnitude-regime note
    * above.  Three states (r14 verdict #5 — the flip used to be manual,
    * so a 100× corpus under default conf got correct-by-crash):
    * `"true"`/`"false"` PIN the regime; unset or `"auto"` (the default)
    * resolves to PROMOTED via [[decimalOn]] — the rationale there. */
  def decimal128Conf(s: SparkSession): Option[Boolean] =
    s.conf.getOption("spark.graft.decimal128").flatMap {
      case "auto" => None
      case v => Some(v.toBoolean)
    }

  /** The AUTO regime is PROMOTED.  Why not "peek at the counts and pick
    * int64 when safe" (the literal r14 ask): (a) a plan-time peek
    * executes an aggregate during query CONSTRUCTION, which violates the
    * construction-purity gate (QueryPacksSpec: building a DataFrame
    * launches zero action jobs) and made every later plan's evidence
    * order-dependent; (b) a runtime CASE over both arithmetics cannot
    * preserve the int64 path either — Spark's common-type coercion types
    * the CASE result decimal(38,0) regardless of which branch runs.  So
    * the only way to KEEP int64 is a conf pin, and auto must choose one
    * type: decimal(38,0) is exact at any corpus scale and costs nothing
    * here, because every promoted expression lives on a bounded audit
    * relation (≤ B buckets / ≤ k cells / ≤ PqM·PqK codes / 1-row totals)
    * — the corpus-sized arithmetic upstream (token bucketing, distance
    * masses) is int64 in BOTH regimes.  Values are bit-identical where
    * int64 doesn't overflow (Decimal128ParitySpec), so the oracle is
    * unaffected; a deployment pinning `false` for the int64 micro-win
    * should preflight [[selectorNeedsDecimal128]]/[[crossNeedsDecimal128]]. */
  def decimalOn(s: SparkSession): Boolean =
    decimal128Conf(s).getOrElse(true)

  /** Pinned-int64 preflight headroom: the regime is safe only while
    * every product BOUND stays under half of int64 — the bound is exact
    * worst-case per the relation's own maxima/totals, the 2× margin
    * absorbs the one growth step between this audit and the next
    * (counts are epoch-monotone, they can't double silently inside a
    * decision). */
  private val Int64Headroom: BigInt = BigInt(Long.MaxValue) / 2

  /** Pinned-int64 PREFLIGHT for the SELECTOR leg (run it before setting
    * `spark.graft.decimal128=false` — it executes one tiny aggregate, so
    * it must never be called during query construction): does any
    * product in [[selectorWeights]]/[[selectorLegOf]]'s int64 path risk
    * overflow at this relation's magnitudes?  One aggregate over the
    * ≤ B-row drift counts (maxima + totals), then exact BigInt bounds on
    * each product: shift terms n_inc·NRₐ and cr_arch·TIᵣ, their 10⁴·Σ
    * numerator, the w_old/w_new numerators and denominators, and the
    * 2·NRₐ·TIᵣ normalizer. */
  def selectorNeedsDecimal128(per: DataFrame, buckets: Long): Boolean = {
    val r = per.agg(
      count(lit(1)).as("n"),
      coalesce(max(col("ct_arch")), lit(0L)).as("xct"),
      coalesce(max(col("cr_arch")), lit(0L)).as("xcr"),
      coalesce(max(col("ct_inc")), lit(0L)).as("xci"),
      coalesce(max(col("n_inc")), lit(0L)).as("xni"),
      coalesce(sum(col("ct_arch")), lit(0L)).as("nta"),
      coalesce(sum(col("cr_arch")), lit(0L)).as("nra"),
      coalesce(sum(col("ct_inc")), lit(0L)).as("tit"),
      coalesce(sum(col("n_inc")), lit(0L)).as("tir")).collect().head
    val Seq(n, xct, xcr, xci, xni, nta, nra, tit, tir) =
      (0 to 8).map(i => BigInt(r.getLong(i)))
    val b = BigInt(buckets)
    val shTerm = (xni * nra).max(xcr * tir)
    val bounds = Seq(
      shTerm,                                     // per-bucket shift products
      BigInt(10000) * n * shTerm,                 // 10⁴·Σsh numerator
      BigInt(2) * nra * tir,                      // staleness normalizer
      (xct + 1) * (nra + b) * 10000,              // w_old numerator
      (xcr + 1) * (nta + b),                      // w_old denominator
      (xct + xci + 1) * (nra + tir + b) * 10000,  // w_new numerator
      (xcr + xni + 1) * (nta + tit + b))          // w_new denominator
    bounds.exists(_ > Int64Headroom)
  }

  /** Pinned-int64 PREFLIGHT for a CROSS-STALENESS leg (+ its
    * priced-benefit sibling, whose 10⁴·Σd_before numerator is bounded by
    * 10⁴·(ma+mi) — d_before is the same stale-model mass split this
    * relation totals).  Executes one tiny aggregate — never call during
    * query construction. */
  def crossNeedsDecimal128(per: DataFrame,
      nA: String, nI: String, mA: String, mI: String): Boolean = {
    val r = per.agg(
      coalesce(sum(col(nA)), lit(0L)).as("na"),
      coalesce(sum(col(nI)), lit(0L)).as("ni"),
      coalesce(sum(col(mA)), lit(0L)).as("ma"),
      coalesce(sum(col(mI)), lit(0L)).as("mi")).collect().head
    val Seq(na, ni, ma, mi) = (0 to 3).map(i => BigInt(r.getLong(i)))
    Seq(BigInt(10000) * mi * na, ma * ni, BigInt(10000) * (ma + mi))
      .exists(_ > Int64Headroom)
  }


  /** Wrap a SQL term in the decimal(38,0) promotion when `dec` — ONE
    * promoted factor per product is enough: decimal is sticky through
    * `*`/`-`, and integral `div` over decimals returns bigint. */
  private def big(e: String, dec: Boolean): String =
    if (dec) s"cast(($e) as decimal(38,0))" else s"($e)"

  /** `10⁴·(before − after) div before` in bp — the priced-retrain
    * benefit expression the ivf/pq legs share, promotion-aware. */
  def benefitBp(before: String, after: String, decimal: Boolean): Column =
    expr(s"(10000 * (${big(before, decimal)} - ($after))) div nullif($before, 0)")

  /** Default decision thresholds, baked into the DuckDB oracle; a
    * deployment overrides via `spark.graft.refresh.minStalenessBp` /
    * `spark.graft.refresh.minBenefitBp` (conf-reading queries diverge
    * from the static oracle — the driver never sets these, the
    * RefreshDecisionSpec exercises the overrides). */
  val DefaultMinStalenessBp = 250L
  val DefaultMinBenefitBp = 100L

  def thresholds(s: SparkSession): (Long, Long) = (
    s.conf.getOption("spark.graft.refresh.minStalenessBp").map(_.toLong)
      .getOrElse(DefaultMinStalenessBp),
    s.conf.getOption("spark.graft.refresh.minBenefitBp").map(_.toLong)
      .getOrElse(DefaultMinBenefitBp))

  /** Cross-multiplied staleness of an incoming slice vs the archive a
    * stored model trained on, over a per-group relation carrying
    * archive/incoming counts (`nA`/`nI`) and masses (`mA`/`mI` — IVF
    * distance mass, PQ quantization-error mass):
    *
    *   staleness_bp = 10⁴ · (Σmᵢ·Σnₐ) div (Σmₐ·Σnᵢ) − 10⁴
    *
    * = the relative excess of the incoming slice's mean mass over the
    * archive's, in basis points (positive = today's data fits the
    * stored model worse; 0 = no drift; exactly s13/s14's shift
    * statistic collapsed to one scheduling-grade number).  The batch
    * legs pass the audit's per-cell/per-subspace relation; the live
    * composition passes the monitor's reportOf output — same columns,
    * same expression. */
  def crossStalenessBp(per: DataFrame,
      nA: String, nI: String, mA: String, mI: String,
      decimal: Boolean = false): DataFrame =
    // nullif: the live composition's cold start (monitors booted, no
    // incoming data yet) coalesces the incoming side to TRUE ZEROS (not
    // the nulls an empty batch aggregate yields), and an un-guarded
    // integer div by zero raises under ANSI — no-evidence must read as
    // null staleness (→ 'keep'), never crash the decision query
    per.agg(sum(col(nA)).as("na"), sum(col(nI)).as("ni"),
        sum(col(mA)).as("ma"), sum(col(mI)).as("mi"))
      .select(expr(s"(10000 * ${big("mi", decimal)} * na) " +
          s"div nullif(${big("ma", decimal)} * ni, 0) - 10000")
        .as("staleness_bp"))

  /** Selector staleness AND refresh benefit in one pass over c12's
    * per-bucket drift counts `(b, ct_arch, cr_arch, ct_inc, n_inc)`:
    *
    *   staleness_bp = 10⁴ · Σ|n_inc·NRₐ − cr_arch·TIᵣ| div (2·NRₐ·TIᵣ)
    *     — the exact total-variation distance between the archive and
    *     incoming raw-pool bucket distributions (the cross-multiplied
    *     |shift_x| mass of c12, normalized; ≤ 10⁴ by construction).
    *   benefit_bp = Σ|w_new − w_old| div #buckets
    *     — the mean absolute move of the stored c11 weight (already in
    *     bp) if the selector retrained on archive+incoming, i.e. how
    *     much the selection scores would actually change.
    *
    * The live composition has no incoming TARGET counts (T20 streams
    * the raw slice), so it passes `ct_inc = 0` and reads ONLY
    * staleness_bp, taking benefit from the last batch refresh pricing —
    * the staleness expression stays shared either way.  Totals ride a
    * window over the ≤ B-row counts relation (the c4 single-partition-
    * over-bounded-rows idiom), so the corpus-sized token pass below it
    * runs ONCE. */
  /** The PER-BUCKET selector arithmetic — cross-multiplied shift mass
    * plus the stored (`w_old`) and hypothetically-retrained (`w_new`)
    * c11 weight per bucket, totals riding a window over the ≤ B-row
    * counts relation.  Extracted so [[selectorLegOf]]'s aggregate and
    * c16's serving-weight export read the SAME expressions. */
  def selectorWeights(per: DataFrame, buckets: Long,
      decimal: Boolean = false): DataFrame = {
    val w = Window.partitionBy()
    // every count × total product is promotion-wrapped: these are the
    // expressions whose int64 ceiling arrives FIRST (the header's
    // w_old/w_new regime — per-bucket-count × total-count × 10⁴)
    per
      .withColumn("nt_a", sum(col("ct_arch")).over(w))
      .withColumn("nr_a", sum(col("cr_arch")).over(w))
      .withColumn("ti_t", sum(col("ct_inc")).over(w))
      .withColumn("ti_r", sum(col("n_inc")).over(w))
      .withColumn("sh", expr(
        s"abs(${big("n_inc", decimal)} * nr_a - ${big("cr_arch", decimal)} * ti_r)"))
      .withColumn("w_old", expr(
        s"(${big("ct_arch + 1", decimal)} * (nr_a + $buckets) * 10000) " +
          s"div (${big("cr_arch + 1", decimal)} * (nt_a + $buckets))"))
      .withColumn("w_new", expr(
        s"(${big("ct_arch + ct_inc + 1", decimal)} * (nr_a + ti_r + $buckets) * 10000) " +
          s"div (${big("cr_arch + n_inc + 1", decimal)} * (nt_a + ti_t + $buckets))"))
  }

  def selectorLegOf(per: DataFrame, buckets: Long,
      decimal: Boolean = false): DataFrame =
    selectorWeights(per, buckets, decimal)
      .agg(
        // nullif: the crossStalenessBp cold-start rationale — a live
        // stream with zero incoming tokens must read null, not crash
        expr(s"(10000 * ${big("sum(sh)", decimal)}) " +
            s"div nullif(2 * ${big("max(nr_a)", decimal)} * max(ti_r), 0)")
          .as("staleness_bp"),
        // w_old/w_new are bigint either way (div's output type), so the
        // benefit mean needs no promotion
        expr("sum(abs(w_new - w_old)) div nullif(count(*), 0)").as("benefit_bp"))

  /** The DuckDB totals CTEs of an ivf/pq decision leg — archive/incoming
    * counts and masses from the stale full-corpus assignment `massRel`
    * plus the refreshed mass from `afterRel` — stated ONCE for every
    * oracle that derives a verdict (c16's execution, the s18/s19/s20
    * serving paths) instead of restating the split per site. */
  def totAftCtes(massRel: String, afterRel: String): String = s"""tot AS (
        SELECT
          CAST(sum(CASE WHEN vec_id % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(sum(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS ni,
          CAST(sum(CASE WHEN vec_id % 10 <> 7 THEN dist ELSE 0 END) AS BIGINT) AS ma,
          CAST(sum(CASE WHEN vec_id % 10 = 7 THEN dist ELSE 0 END) AS BIGINT) AS mi
        FROM $massRel),
      aft AS (SELECT CAST(sum(dist) AS BIGINT) AS ea FROM $afterRel)"""

  /** The DuckDB verdict CASE over [[totAftCtes]]'s `tot`/`aft` — the
    * ivf/pq decision rule at the DEFAULT thresholds (the oracle
    * convention: conf-overridden thresholds diverge from the static
    * oracle by design), stated ONCE. */
  def vdecCte: String = s"""vdec AS (
        SELECT CASE WHEN
            (10000 * mi * na) // nullif(ma * ni, 0) - 10000
              >= $DefaultMinStalenessBp
            AND (10000 * (ma + mi - ea)) // nullif(ma + mi, 0)
              >= $DefaultMinBenefitBp
          THEN 'refresh' ELSE 'keep' END AS verdict
        FROM tot, aft)"""

  /** THE decision rule over a `(family, staleness_bp, benefit_bp)`
    * legs relation: refresh iff the model is stale enough AND the
    * retrain buys enough — a stale model a refresh can't improve
    * (drifted data the model family can't fit better) keeps serving,
    * and a cheap-win refresh on a fresh model isn't scheduled either.
    * Self-describing output: the thresholds ride along. */
  def decide(legs: DataFrame, minStalenessBp: Long, minBenefitBp: Long): DataFrame =
    legs.select(col("family"),
        col("staleness_bp").cast("long").as("staleness_bp"),
        col("benefit_bp").cast("long").as("benefit_bp"),
        lit(minStalenessBp).as("min_staleness_bp"),
        lit(minBenefitBp).as("min_benefit_bp"),
        verdictCol(col("staleness_bp"), col("benefit_bp"),
          minStalenessBp, minBenefitBp).as("verdict"))
      .orderBy(col("family"))

  def verdictCol(stalenessBp: Column, benefitBp: Column,
      minStalenessBp: Long, minBenefitBp: Long): Column =
    when(stalenessBp >= minStalenessBp && benefitBp >= minBenefitBp,
      lit("refresh")).otherwise(lit("keep"))
}
