package graft.queries

import graft.NamedQuery
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Dashboard-parity query pack — each chart/metric of the reference dashboard
  * (`dashboard/streamlit_app.py`, SURVEY.md §2.6–2.7 A1–A5 / O1–O5) re-expressed
  * as a Spark aggregate over the driver testdata tables. The reference computes
  * these in pandas over the full accumulated output on every refresh; here they
  * are single-pass hash aggregates / top-k plans that scale out.
  */
object Analytics {

  /** A1+A2 metrics row: COUNT(*), AVG engagement (DSA:266–283). */
  val a1Metrics = NamedQuery(
    "a1_metrics",
    (s, dir) => {
      Tables.events(s, dir).agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        Exact.avg4(col("value"), 2).as("avg_value"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
    },
    Some("""SELECT count(*) AS total_events,
      count(DISTINCT user_id) AS unique_users,
      floor(round(sum(value) * 100) / 100.0 / count(*) * 10000) / 10000.0 AS avg_value,
      round(min(value), 2) AS min_value,
      round(max(value), 2) AS max_value
      FROM events"""),
    doc = "dashboard metrics banner (DSA:266–283 A1/A2)")

  /** A3 value_counts parity: distribution with count-desc order and explicit
    * tie-break (pandas value_counts sorts desc; DSA:309/326). */
  val a3Distribution = NamedQuery(
    "a3_type_distribution",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n
      FROM events GROUP BY event_type
      ORDER BY n DESC, event_type"""),
    doc = "value_counts() parity (DSA:309 pie / DSA:326 bar)")

  /** A4 shape: flatten + group + top-10 (DSA:337–343 hashtags). Documents have
    * no hashtags, so the flatten runs over whitespace tokens — same explode →
    * hash-agg → TakeOrderedAndProject plan. */
  val a4TokenTop10 = NamedQuery(
    "a4_token_top10",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(10)
    },
    Some("""SELECT token, count(*) AS n
      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents) t
      WHERE token <> ''
      GROUP BY token ORDER BY n DESC, token LIMIT 10"""),
    doc = "explode + group + top-k (DSA:337–343 hashtag top-10 shape)")

  /** A5 shape: plain group + top-10 (DSA:361 countries → documents.source). */
  val a5SourceTop10 = NamedQuery(
    "a5_source_top10",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("source"))
        .limit(10)
    },
    Some("""SELECT source, count(*) AS n
      FROM documents GROUP BY source
      ORDER BY n DESC, source LIMIT 10"""),
    doc = "group + top-10 (DSA:361 country top-10 shape)")

  /** O2/O3 recency limit: latest-100 events, newest first (DSA:372, 389). */
  val o2LatestN = NamedQuery(
    "o2_latest_events",
    (s, dir) => {
      Tables.events(s, dir)
        .orderBy(col("ts").desc, col("event_id"))
        .limit(100)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    },
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
      FROM events ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id LIMIT 100"""),
    doc = "tail-N recency limit (DSA:372 scatter cap / DSA:389 recent posts)")

  /** O3+F5+F6 display pipeline: 10 most recent events, newest first, with
    * formatted time-of-day and truncated payload preview (DSA:386–395). */
  val o3RecentDisplay = NamedQuery(
    "o3_recent_display",
    (s, dir) => {
      Tables.events(s, dir)
        .orderBy(col("ts").desc, col("event_id"))
        .limit(10)
        .select(col("event_id"),
          date_format(col("ts"), "HH:mm:ss").as("time_str"),
          col("event_type"),
          concat(substring(col("props"), 1, 8), lit("...")).as("preview"))
    },
    Some("""SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS time_str,
        event_type, substr(props, 1, 8) || '...' AS preview
      FROM events ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id LIMIT 10"""),
    doc = "recent-posts display table: tail-N + strftime + truncate (O3/F5/F6)")

  /** P9/P10 parity under nulls: synthesize nulls deterministically, then
    * repair with the dashboard's defaults (coalesce-to-default semantics,
    * DSA:202–246) — oracle-checked. */
  val a7NullRepair = NamedQuery(
    "a7_null_repair",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("v_nullable", when(col("value") < 50.0, lit(null).cast("double")).otherwise(col("value")))
        .withColumn("t_nullable", when(col("user_id") % 7 === 0, lit(null).cast("string")).otherwise(col("event_type")))
        .withColumn("v_repaired", coalesce(col("v_nullable"), lit(0.0)))
        .withColumn("t_repaired", coalesce(col("t_nullable"), lit("unknown")))
        .groupBy(col("t_repaired"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("v_repaired")), 2).as("sum_v"),
          count(col("v_nullable")).as("n_nonnull"))
        .orderBy(col("t_repaired"))
    },
    Some("""SELECT t_repaired, count(*) AS n, round(sum(v_repaired), 2) AS sum_v,
        count(v_nullable) AS n_nonnull
      FROM (SELECT
        CASE WHEN value < 50.0 THEN NULL ELSE value END AS v_nullable,
        coalesce(CASE WHEN value < 50.0 THEN NULL ELSE value END, 0.0) AS v_repaired,
        coalesce(CASE WHEN user_id % 7 = 0 THEN NULL ELSE event_type END, 'unknown') AS t_repaired
        FROM events) t
      GROUP BY t_repaired ORDER BY t_repaired"""),
    doc = "null repair: fillna defaults + numeric coercion (P9/P10 parity)")

  /** O1 literal parity: the RAW ordered sentiment timeline (DSA:293–302) —
    * score over time, no bucketing (the bucketed forms are q10/q14).  A
    * global ORDER BY compiles to a range-partitioned sort: each executor
    * sorts its range, no single-node bottleneck.  Score derivation matches
    * q12 (events.value → [−1, 1]). */
  val o1Timeline = NamedQuery(
    "o1_sentiment_timeline",
    (s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"),
          round((col("value") - lit(245.0)) / lit(245.0), 6).as("score"))
        .orderBy(col("ts"), col("event_id"))
    },
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        round((value - 245.0) / 245.0, 6) AS score
      FROM events ORDER BY CAST(ts AS TIMESTAMP), event_id"""),
    doc = "raw ordered sentiment timeline (DSA:293–302, O1 literal parity)")

  /** A2 emoji bucketing parity (DSA:281–283): overall average sentiment
    * rendered as the dashboard's mood emoji at the ±0.1 thresholds. */
  val a2EmojiMood = NamedQuery(
    "a2_emoji_mood",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("score", round((col("value") - lit(245.0)) / lit(245.0), 6))
        .agg(Exact.avg4(col("score"), 6).as("avg_score"))
        .withColumn("mood",
          when(col("avg_score") > 0.1, "😊 positive")
            .when(col("avg_score") < -0.1, "😞 negative")
            .otherwise("😐 neutral"))
        .select(col("avg_score"), col("mood"))
    },
    Some("""SELECT avg_score,
        CASE WHEN avg_score > 0.1 THEN '😊 positive'
             WHEN avg_score < -0.1 THEN '😞 negative'
             ELSE '😐 neutral' END AS mood
      FROM (SELECT floor(round(sum(score) * 1000000) / 1000000.0 / count(*) * 10000) / 10000.0 AS avg_score
            FROM (SELECT round((value - 245.0) / 245.0, 6) AS score FROM events) t) m"""),
    doc = "avg-sentiment emoji bucketing at ±0.1 (DSA:281–283, A2 parity)")

  /** Approximate distinct — the 100 TB-scale path for unique-user counts:
    * a bounded-memory, map-side-combined KMV sketch
    * ([[graft.functions.KmvDistinct]]) over a Carter–Wegman universal hash
    * of `user_id`. Unlike round-2's `approx_count_distinct` (HLL,
    * JVM-only estimate ⇒ rows-only check), every step here — mod-prime
    * hash, k-th order statistic, `(k−1)·m div h_k` — is exact int64
    * arithmetic, so DuckDB replays the estimate bit-for-bit: FULL value
    * oracle. Accuracy vs the exact count and partition-invariance of the
    * merge are spec-pinned (KmvSpec); exactness is covered by
    * q8_distinct_users, and the built-in HLL path remains spec-covered
    * alongside. */
  private val KmvK = 64
  private[graft] val KmvP = graft.functions.CharFoldKernel.Prime
  // splitmix64(0xA600/0xB600)-derived universal-hash constants (same
  // recipe as the d3 MinHash family): a ∈ [1, p−1], b ∈ [0, p).
  private val KmvA = 464054921L
  private val KmvB = 327776542L

  val aApproxDistinct = NamedQuery(
    "a6_approx_distinct",
    (s, dir) => {
      graft.sentiment.GraftFunctions.register(s)
      val h = ((col("user_id") % KmvP) * KmvA + KmvB) % KmvP
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(call_function("graft_kmv", h, lit(KmvK), lit(KmvP)).as("approx_users"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH h AS (
        SELECT DISTINCT event_type, ((user_id % $KmvP) * $KmvA + $KmvB) % $KmvP AS hv
        FROM events),
      r AS (
        SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
          count(*) OVER (PARTITION BY event_type) AS nd
        FROM h)
      SELECT event_type,
        CAST(CASE WHEN max(nd) < $KmvK THEN max(nd)
             ELSE CAST(${(KmvK - 1).toLong} AS BIGINT) * $KmvP // max(CASE WHEN rn = $KmvK THEN hv END)
             END AS BIGINT) AS approx_users
      FROM r GROUP BY event_type ORDER BY event_type"""),
    doc = "KMV(64) distinct sketch (custom TypedImperativeAggregate, " +
      "integer-exact estimator); FULL value oracle — scale path for q8")

  /** Trend/burst detection — the capability the reference is NAMED for
    * ("Trend Tracker"), surfaced as a first-class query instead of a
    * dashboard eyeball: per-(event_type, day) activity counts,
    * day-over-day growth via lag() in EXACT integer basis points
    * (`n·10⁴ DIV prev_n` — the q36 DIV rule, epoch ≥ 0), and a burst
    * flag at ≥1.5× growth with a minimum-support floor (a spike from 2
    * to 4 events is noise, not a trend).  Growth is only defined for
    * ADJACENT days (`day = prev_day + 1`): lag() walks observed days, so
    * without the adjacency guard a count after a quiet week would be
    * "growth" against a stale baseline.  Scale shape: ONE fact shuffle
    * for the (type, day) counts with map-side combine; the lag window
    * and flagging run over the tiny per-day relation partitioned by
    * type — the window never touches the event stream.  At 100 TB with
    * date-partitioned events (LayoutSpec), the count stage reads only
    * the days in scope. */
  val a8TrendingBursts = NamedQuery(
    "a8_trending_bursts",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      Tables.events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("prev_day", lag(col("day"), 1).over(w))
        // lag() walks OBSERVED days; requiring prev_day adjacency keeps
        // the contract honestly day-over-day — a count following a gap
        // has no yesterday baseline and emits no growth row
        .filter(col("prev_n").isNotNull && col("day") === col("prev_day") + 1L)
        .withColumn("growth_bp", expr("n * 10000 DIV prev_n"))
        .withColumn("is_burst",
          (col("growth_bp") >= 15000L && col("n") >= 20L).cast("int"))
        .select(col("event_type"), col("day"), col("prev_n"), col("n"),
          col("growth_bp"), col("is_burst"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH d AS (
        SELECT event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
          count(*) AS n
        FROM events GROUP BY 1, 2),
      g AS (
        SELECT event_type, day,
          lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
          lag(day, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_day, n
        FROM d)
      SELECT event_type, day, prev_n, n,
        n * 10000 // prev_n AS growth_bp,
        CAST(CASE WHEN n * 10000 // prev_n >= 15000 AND n >= 20
             THEN 1 ELSE 0 END AS INT) AS is_burst
      FROM g WHERE prev_n IS NOT NULL AND day = prev_day + 1
      ORDER BY event_type, day"""),
    doc = "trend/burst detection: day-over-day growth per event type in " +
      "integer basis points (lag window over the tiny per-day relation), " +
      "bursts at ≥1.5× growth with a support floor; FULL value oracle")

  /** Rolling z-score anomaly detection over the hourly event-count
    * series — the monitoring query a live tracker pages on ("this hour's
    * volume is ≥3σ off its trailing-day baseline"), complementing a8's
    * day-over-day growth rule with a variance-aware one.
    *
    * The z-test runs in EXACT integer arithmetic so both engines agree
    * bit-for-bit: with a trailing window of W=24 observed hours carrying
    * S = Σxᵢ and SS = Σxᵢ², the flag `|x−μ| > 3σ` multiplies out to
    * `(W·x − S)² > 9·(W·SS − S²)` — counts are integers, so every term
    * is an exact integer in a double register (magnitudes ≤ ~2⁴⁵ at
    * 100× this SF).  σ here is the population std of the baseline
    * window; a zero-variance baseline flags any deviation (lhs > 0,
    * rhs = 0), which is the right alert semantics for a flat series.
    *
    * Scale shape: the hourly pre-aggregation map-side-combines the raw
    * events (one shuffle on (event_type, hour) carrying one row per
    * bucket per mapper); the window walks the tiny per-hour relation
    * partitioned by event_type — at 100 TB that relation is
    * |types|·|hours| rows (~10⁵/decade/type), never the firehose.  The
    * trailing frame spans OBSERVED hours; a full 24-bucket baseline is
    * required (cnt = 24), so series gaps shrink nothing silently — they
    * just delay arming, same contract as a8's adjacency guard. */
  val a9AnomalyZscore = NamedQuery(
    "a9_anomaly_zscore",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val W = 24
      val tw = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-W, -1)
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cnt", count(col("n")).over(tw))
        .withColumn("s", sum(col("n")).over(tw))
        .withColumn("ss", sum(col("n") * col("n")).over(tw))
        .filter(col("cnt") === W &&
          (lit(W) * col("n") - col("s")) * (lit(W) * col("n") - col("s")) >
            lit(9) * (lit(W) * col("ss") - col("s") * col("s")))
        .select(col("event_type"), col("hour"), col("n"),
          col("s").as("base_sum"),
          signum(lit(W) * col("n") - col("s")).cast("int").as("direction"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""WITH h AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      w AS (
        SELECT event_type, hour, n,
               count(*) OVER tw AS cnt, sum(n) OVER tw AS s,
               sum(n * n) OVER tw AS ss
        FROM h WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT event_type, hour, n, CAST(s AS BIGINT) AS base_sum,
             CAST(CASE WHEN 24 * n - s > 0 THEN 1
                       WHEN 24 * n - s < 0 THEN -1 ELSE 0 END AS INT) AS direction
      FROM w
      WHERE cnt = 24 AND (24 * n - s) * (24 * n - s) > 9 * (24 * ss - s * s)
      ORDER BY hour, event_type"""),
    doc = "rolling z-score anomaly detection: hourly event counts ≥3σ off " +
      "their trailing-24h baseline, exact integer variance test, FULL value oracle")

  /** splitmix64 — deterministic pseudo-random constants (public mixing
    * recipe; same generator as the d3/s2 families). */
  private def mix64(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  // Carter–Wegman row hashes for the a10 Count-Min sketch: d=3 rows of
  // w=256 buckets, a ∈ [1, p−1], b ∈ [0, p) — every product < 2^60, so
  // the whole sketch replays exactly in DuckDB.
  private[graft] val CmsD = 3
  private[graft] val CmsW = 256
  private[graft] val CmsA: Seq[Long] = (0 until CmsD).map(i => math.floorMod(mix64(0xC100L + i), KmvP - 1) + 1)
  private[graft] val CmsB: Seq[Long] = (0 until CmsD).map(i => math.floorMod(mix64(0xC200L + i), KmvP))

  /** Approximate heavy hitters — the frequency complement of a6's
    * cardinality sketch: a Count-Min sketch
    * ([[graft.functions.CountMinAgg]], Cormode & Muthukrishnan 2005)
    * over `user_id`, read back as the top-15 users by estimated event
    * count. The d=3 × w=256 counter array is a commutative monoid that
    * COMBINES MAP-SIDE, so the one firehose pass shuffles a constant
    * `d·w` vector per mapper — never the key universe — and the finished
    * 1-row sketch BROADCASTS to the candidate side (constant-size
    * crossJoin, the s1 pattern). Estimates are never under the true
    * count and overshoot by ≤ ε·N (ε ≈ e/w) w.h.p.; on this near-uniform
    * synthetic key the collision term dominates the ranking (the
    * guarantee, not the anecdote, is what CmsSpec pins on a planted
    * Zipfian stream), while the ORACLE pins the arithmetic bit-for-bit:
    * every hash, counter and min replays in DuckDB as a GROUP BY over
    * the same mod-prime algebra.
    *
    * Candidate enumeration here is a `DISTINCT user_id` pass (fine at
    * any SF of this table); at a true 100 TB key universe the candidate
    * set comes from per-partition local tops or an external watchlist —
    * the sketch's point-query contract is unchanged. */
  val a10HeavyHitters = NamedQuery(
    "a10_heavy_hitters",
    (s, dir) => {
      graft.sentiment.GraftFunctions.register(s)
      def bucket(i: Int) =
        ((col("user_id") % KmvP) * CmsA(i) + CmsB(i)) % KmvP % CmsW
      val sketch = Tables.events(s, dir)
        .agg(call_function("graft_cms",
          array((0 until CmsD).map(bucket): _*), lit(CmsW)).as("cms"))
      val est = (0 until CmsD).map(i =>
        element_at(col("cms"), (bucket(i) + lit(i * CmsW) + lit(1)).cast("int")))
      Tables.events(s, dir).select(col("user_id")).distinct()
        .crossJoin(broadcast(sketch))
        .select(col("user_id"), least(est: _*).as("est_count"))
        .orderBy(col("est_count").desc, col("user_id"))
        .limit(15)
    },
    Some {
      val rows = (0 until CmsD).map(i => s"(${i}, ${CmsA(i)}, ${CmsB(i)})").mkString(", ")
      s"""WITH c(i, a, b) AS (VALUES $rows),
        counts AS (
          SELECT c.i AS i, ((e.user_id % $KmvP) * c.a + c.b) % $KmvP % $CmsW AS bkt,
                 count(*) AS n
          FROM events e CROSS JOIN c GROUP BY 1, 2),
        est AS (
          SELECT k.user_id, min(n) AS est_count
          FROM (SELECT DISTINCT user_id FROM events) k
          CROSS JOIN c
          JOIN counts ON counts.i = c.i
            AND counts.bkt = ((k.user_id % $KmvP) * c.a + c.b) % $KmvP % $CmsW
          GROUP BY 1)
        SELECT user_id, est_count FROM est
        ORDER BY est_count DESC, user_id LIMIT 15"""
    },
    doc = "Count-Min heavy hitters: d=3×w=256 mergeable counter sketch " +
      "(custom TypedImperativeAggregate), broadcast point-estimates, " +
      "top-15 by estimate; FULL value oracle")

  /** Weighted quantiles — the length-cutoff question a token-budgeted
    * training pipeline actually asks: "which document length contains
    * the q-th percentile of the corpus's TOKENS (not its documents)?"
    * A plain length percentile (q16's shape) over-weights short docs;
    * here each document votes with its token count, so p90 is the
    * length below which 90% of trainable tokens live — the number a
    * truncation/packing policy is tuned against.
    *
    * Definition (integer-exact on both engines): per source, the
    * weighted q-quantile is the smallest `n_chars` v with
    * `100·cumweight(v) ≥ q·totalweight`, ties merged by grouping on the
    * value first so cumulative weight is well-defined. The threshold
    * compare is pure int64 — no float quantile interpolation to drift.
    *
    * Scale shape: the heavy pass is the (source, n_chars) groupBy —
    * map-side-combined, shuffle carries one row per distinct (group,
    * value) pair, never the corpus. The windows then walk that
    * collapsed relation (bounded by |sources|·|distinct lengths|, ~10⁵
    * at any SF), and the final conditional-min agg needs no join —
    * one pass, two shuffles total, both over collapsed relations. */
  val a11WeightedQuantiles = NamedQuery(
    "a11_weighted_quantiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byVal = Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("text") =!= "")
        .groupBy(col("source"), col("n_chars"))
        .agg(sum(size(TextOps.tokens(col("text"))).cast("long")).as("w"))
      val cumW = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("source"))
      def firstCross(q: Int) =
        min(when(col("cw") * 100 >= col("tw") * q, col("n_chars")))
      byVal
        .withColumn("cw", sum(col("w")).over(cumW))
        .withColumn("tw", sum(col("w")).over(totW))
        .groupBy(col("source"))
        .agg(max(col("tw")).as("total_tokens"),
          firstCross(25).as("p25"), firstCross(50).as("p50"),
          firstCross(90).as("p90"))
        .orderBy(col("source"))
    },
    Some(raw"""WITH byval AS (
        SELECT source, n_chars,
               CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS w
        FROM documents WHERE text IS NOT NULL AND text <> ''
        GROUP BY source, n_chars),
      cum AS (
        SELECT source, n_chars,
               CAST(sum(w) OVER (PARTITION BY source ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
               CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS tw
        FROM byval)
      SELECT source, CAST(max(tw) AS BIGINT) AS total_tokens,
             min(CASE WHEN cw * 100 >= tw * 25 THEN n_chars END) AS p25,
             min(CASE WHEN cw * 100 >= tw * 50 THEN n_chars END) AS p50,
             min(CASE WHEN cw * 100 >= tw * 90 THEN n_chars END) AS p90
      FROM cum GROUP BY source ORDER BY source"""),
    doc = "token-weighted length quantiles per source: smallest length " +
      "holding >=q% of corpus tokens, exact integer threshold, FULL value oracle")

  /** Distribution drift — the train/serving-skew monitor every deployed
    * pipeline needs: has the DISTRIBUTION of a metric changed between
    * two periods, not just its mean (a9 catches level shifts; a bimodal
    * split or variance blow-up leaves the mean untouched and a9 silent)?
    *
    * The statistic is the two-sample Kolmogorov–Smirnov distance run
    * entirely on the integer grid: with per-period counts n₀, n₁ and
    * cumulative counts c₀(v), c₁(v) walked over the merged distinct
    * values, D·n₀·n₁ = max |c₀(v)·n₁ − c₁(v)·n₀| — the walk products and
    * the basis-point step both run in decimal(38) (HUGEINT in the
    * oracle), so no count short of ~10¹⁹ per half can overflow the
    * statistic; only the REPORTED ks_scaled column is int64 (past that
    * bound, read ks_bp).  No CDF floats, no p-value approximation — both
    * engines agree bit-for-bit.
    *
    * Periods: the table's own [min ts, max ts] midpoint (computed as a
    * 1-row aggregate that broadcasts) — deterministic and
    * parameter-free.  Types with an empty period are excluded (KS
    * undefined; their drift signal is a8/a9's volume alarms).
    *
    * Scale shape: one map-side-combined (type, period, value) collapse
    * shuffles one row per distinct triple; the KS walk is a window over
    * the collapsed per-type relation (|types|·|distinct values| rows).
    * At a truly continuous 100 TB metric the collapse pre-buckets
    * values into quantile bins first — same plan, bounded width. */
  val a12DistributionDrift = NamedQuery(
    "a12_distribution_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg((min(col("us")) + max(col("us"))).as("minmax"))
      val counted = ev.crossJoin(broadcast(mid))
        .withColumn("period", (col("us") * 2 > col("minmax")).cast("int"))
        .groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("period") === 0, 1L).otherwise(0L)).as("d0"),
          sum(when(col("period") === 1, 1L).otherwise(0L)).as("d1"))
      val cum = Window.partitionBy(col("event_type")).orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("event_type"))
      counted
        .withColumn("c0", sum(col("d0")).over(cum))
        .withColumn("c1", sum(col("d1")).over(cum))
        .withColumn("n0", sum(col("d0")).over(tot))
        .withColumn("n1", sum(col("d1")).over(tot))
        .filter(col("n0") > 0 && col("n1") > 0)
        .groupBy(col("event_type"))
        // the WALK products run in DECIMAL(38)/HUGEINT too: c·n can reach
        // n0·n1, which exceeds int64 once each half holds ~3·10⁹ events —
        // with ANSI on that's a runtime ArithmeticException exactly at
        // the scale the query targets, with ANSI off a silent wrap.  The
        // REPORTED ks_scaled column stays int64 (it saturates the output
        // type only past the same ~9.2e18 bound — report ks_bp there);
        // ks_bp itself is exact at any count.
        .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
          max(abs(col("c0").cast("decimal(38,0)") * col("n1") -
            col("c1").cast("decimal(38,0)") * col("n0"))).as("ks_dec"))
        .withColumn("ks_bp",
          expr("CAST((ks_dec * 10000) div " +
            "(CAST(n0 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))) AS BIGINT)"))
        .select(col("event_type"), col("n0"), col("n1"),
          // SATURATE, don't cast raw: past the int64 bound a bare cast
          // raises under ANSI (the session default) — the "read ks_bp
          // there" fallback must stay reachable (LiveDrift.ksAgainst
          // clamps the same way)
          least(col("ks_dec"), lit(Long.MaxValue).cast("decimal(38,0)"))
            .cast("long").as("ks_scaled"), col("ks_bp"))
        .orderBy(col("event_type"))
    },
    Some("""WITH ev AS (
        SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE value IS NOT NULL),
      mid AS (SELECT min(us) + max(us) AS minmax FROM ev),
      counted AS (
        SELECT event_type, value,
          CAST(sum(CASE WHEN us * 2 <= minmax THEN 1 ELSE 0 END) AS BIGINT) AS d0,
          CAST(sum(CASE WHEN us * 2 > minmax THEN 1 ELSE 0 END) AS BIGINT) AS d1
        FROM ev CROSS JOIN mid GROUP BY event_type, value),
      walked AS (
        SELECT event_type,
          CAST(sum(d0) OVER cum AS BIGINT) AS c0,
          CAST(sum(d1) OVER cum AS BIGINT) AS c1,
          CAST(sum(d0) OVER tot AS BIGINT) AS n0,
          CAST(sum(d1) OVER tot AS BIGINT) AS n1
        FROM counted
        WINDOW cum AS (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               tot AS (PARTITION BY event_type))
      SELECT event_type, max(n0) AS n0, max(n1) AS n1,
        CAST(least(max(abs(CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)),
          CAST(9223372036854775807 AS HUGEINT)) AS BIGINT) AS ks_scaled,
        CAST(max(abs(CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)) * 10000
          // (CAST(max(n0) AS HUGEINT) * max(n1)) AS BIGINT) AS ks_bp
      FROM walked WHERE n0 > 0 AND n1 > 0
      GROUP BY event_type ORDER BY event_type"""),
    doc = "two-sample KS distribution drift per event_type between the " +
      "table's calendar halves, exact integer D*n0*n1 statistic in basis " +
      "points; FULL value oracle")

  /** Bin count for a13's pre-bucketed drift walk.  256 bins bound the
    * walk relation at |types|·256 rows regardless of how many distinct
    * values the metric takes — the knob a deployment sizes against its
    * alerting resolution (more bins = tighter D bound, wider walk). */
  private val DriftBins = 256L

  /** Pre-bucketed KS drift — a12's own documented 100 TB path made
    * real: a12's walk width is |types|·|distinct values|, which for a
    * truly CONTINUOUS metric grows with the data (at 100 TB the
    * collapsed relation itself becomes the bottleneck).  a13 bounds it:
    * values pre-bucket into [[DriftBins]] fixed-width integer-boundary
    * bins — the cut parameters (global floor-min/max) come from ONE
    * 1-row aggregate broadcast back (c8's broadcast-cuts pattern), bin
    * assignment is scan-side integer arithmetic (`floor` then int64
    * scale/DIV — exact in both engines, no float division to drift) —
    * and the identical exact KS walk runs over bin indices.
    *
    * The statistic is EXACTLY the two-sample KS distance of the binned
    * distributions, and because every bin boundary is one of the exact
    * walk's own prefix positions, D_binned ≤ D_exact always, with
    * D_exact − D_binned bounded by the largest single-bin mass — the
    * KsDriftSpec pins both inequalities against a12 on the driver
    * corpus.  A deployment that needs per-type bin ranges swaps the
    * 1-row aggregate for a per-type groupBy joined on type — same
    * shape, one extra tiny shuffle. */
  val a13BinnedDrift = NamedQuery(
    "a13_binned_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val cuts = ev.agg((min(col("us")) + max(col("us"))).as("minmax"),
        floor(min(col("value"))).cast("long").as("fmin"),
        floor(max(col("value"))).cast("long").as("fmax"))
      val counted = ev.crossJoin(broadcast(cuts))
        .withColumn("period", (col("us") * 2 > col("minmax")).cast("int"))
        .withColumn("bin", expr(
          s"(CAST(floor(value) AS BIGINT) - fmin) * $DriftBins DIV (fmax - fmin + 1)"))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("period") === 0, 1L).otherwise(0L)).as("d0"),
          sum(when(col("period") === 1, 1L).otherwise(0L)).as("d1"))
      val cum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("event_type"))
      counted
        .withColumn("c0", sum(col("d0")).over(cum))
        .withColumn("c1", sum(col("d1")).over(cum))
        .withColumn("n0", sum(col("d0")).over(tot))
        .withColumn("n1", sum(col("d1")).over(tot))
        .filter(col("n0") > 0 && col("n1") > 0)
        .groupBy(col("event_type"))
        // DECIMAL(38) walk products + bp step — same reasoning as a12:
        // c·n reaches n0·n1, past int64 at ~3·10⁹ events per half, which
        // is exactly the regime this bounded-width variant exists for
        .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
          max(abs(col("c0").cast("decimal(38,0)") * col("n1") -
            col("c1").cast("decimal(38,0)") * col("n0"))).as("ks_dec"))
        .withColumn("ks_bp",
          expr("CAST((ks_dec * 10000) div " +
            "(CAST(n0 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0))) AS BIGINT)"))
        .select(col("event_type"), col("n0"), col("n1"),
          // SATURATE, don't cast raw: past the int64 bound a bare cast
          // raises under ANSI (the session default) — the "read ks_bp
          // there" fallback must stay reachable (LiveDrift.ksAgainst
          // clamps the same way)
          least(col("ks_dec"), lit(Long.MaxValue).cast("decimal(38,0)"))
            .cast("long").as("ks_scaled"), col("ks_bp"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH ev AS (
        SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE value IS NOT NULL),
      cuts AS (SELECT min(us) + max(us) AS minmax,
        CAST(floor(min(value)) AS BIGINT) AS fmin,
        CAST(floor(max(value)) AS BIGINT) AS fmax FROM ev),
      counted AS (
        SELECT event_type,
          (CAST(floor(value) AS BIGINT) - fmin) * $DriftBins // (fmax - fmin + 1) AS bin,
          CAST(sum(CASE WHEN us * 2 <= minmax THEN 1 ELSE 0 END) AS BIGINT) AS d0,
          CAST(sum(CASE WHEN us * 2 > minmax THEN 1 ELSE 0 END) AS BIGINT) AS d1
        FROM ev CROSS JOIN cuts GROUP BY 1, 2),
      walked AS (
        SELECT event_type,
          CAST(sum(d0) OVER cum AS BIGINT) AS c0,
          CAST(sum(d1) OVER cum AS BIGINT) AS c1,
          CAST(sum(d0) OVER tot AS BIGINT) AS n0,
          CAST(sum(d1) OVER tot AS BIGINT) AS n1
        FROM counted
        WINDOW cum AS (PARTITION BY event_type ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               tot AS (PARTITION BY event_type))
      SELECT event_type, max(n0) AS n0, max(n1) AS n1,
        CAST(least(max(abs(CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)),
          CAST(9223372036854775807 AS HUGEINT)) AS BIGINT) AS ks_scaled,
        CAST(max(abs(CAST(c0 AS HUGEINT) * n1 - CAST(c1 AS HUGEINT) * n0)) * 10000
          // (CAST(max(n0) AS HUGEINT) * max(n1)) AS BIGINT) AS ks_bp
      FROM walked WHERE n0 > 0 AND n1 > 0
      GROUP BY event_type ORDER BY event_type"""),
    doc = "pre-bucketed KS drift: 256 fixed integer-boundary bins from " +
      "one broadcast min/max row, exact KS walk over bin indices — the " +
      "bounded-width variant of a12 for continuous metrics; FULL value oracle")

  def all: Seq[NamedQuery] = Seq(
    a1Metrics, a2EmojiMood, a3Distribution, a4TokenTop10, a5SourceTop10,
    o1Timeline, o2LatestN, o3RecentDisplay, a7NullRepair, aApproxDistinct,
    a8TrendingBursts, a9AnomalyZscore, a10HeavyHitters, a11WeightedQuantiles,
    a12DistributionDrift, a13BinnedDrift)
}
