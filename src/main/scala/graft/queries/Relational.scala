package graft.queries

import graft.NamedQuery
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational query pack: the engine-side additions from SURVEY.md §2.8 —
  * star joins, semi/anti joins, window functions, set ops, distinct counts,
  * time-bucketed aggregation, having.  All declarative DataFrame programs:
  * Catalyst handles pushdown/pruning, AQE picks broadcast vs shuffle joins at
  * runtime (dims here are tiny → broadcast; at 100 TB the fact-fact joins
  * shuffle on their keys with map-side partial aggregation).
  *
  * Float policy: every aggregated double is rounded (2dp for price sums, 4dp
  * for averages/ratios) on BOTH the Spark and DuckDB side so hash comparison
  * is stable across summation orders.
  */
object Relational {

  /** TPC-H Q1 shape (pricing summary). Reference parity: the dashboard's
    * full-history grouped aggregates (SURVEY §2.6 A1–A3) generalized to the
    * canonical scan→filter→hash-agg→sort pipeline. Partial aggregation is
    * map-side; one shuffle on the 6 group keys. */
  val q1PricingSummary = NamedQuery(
    "q1_pricing_summary",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          Exact.avg4(col("l_quantity"), 0).as("avg_qty"),
          Exact.avg4(col("l_extendedprice"), 2).as("avg_price"),
          Exact.avg4(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      floor(round(sum(l_quantity)) / count(*) * 10000) / 10000.0 AS avg_qty,
      floor(round(sum(l_extendedprice) * 100) / 100.0 / count(*) * 10000) / 10000.0 AS avg_price,
      floor(round(sum(l_discount) * 100) / 100.0 / count(*) * 10000) / 10000.0 AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "TPC-H Q1 pricing summary; SURVEY §2.6 hash-agg parity")

  /** Pushdown probe: selective filter + narrow projection.  The point at scale:
    * `.explain` must show PushedFilters on l_quantity/l_shipdate and a 4-column
    * ReadSchema — reading 4 of 11 columns of a 100 TB fact table is the win. */
  val q2FilterPushdown = NamedQuery(
    "q2_filter_pushdown",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= lit(49.0) &&
          col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity >= 49.0 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      ORDER BY l_orderkey, l_linenumber"""),
    doc = "selective scan; verifies parquet predicate pushdown + column pruning")

  /** Star join: fact ⋈ 4 dims, revenue by nation.  Dims are broadcast
    * (customer/nation/region are tiny relative to lineitem at any SF); the
    * only shuffle is lineitem⋈orders on orderkey + the final group-by. */
  val q3StarJoin = NamedQuery(
    "q3_star_join_revenue",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""),
    doc = "star-schema equi-join with broadcast dims; SURVEY §2.8 additions")

  /** Top-k by aggregate with explicit tie-break — plans as
    * TakeOrderedAndProject after the agg (no full sort at scale). */
  val q4TopCustomers = NamedQuery(
    "q4_top_customers",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o  = Tables.orders(s, dir)
      val c  = Tables.customer(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },
    Some("""SELECT c_custkey, c_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 10"""),
    doc = "top-k per aggregate (TakeOrderedAndProject); dashboard A4/A5 top-k shape")

  /** Left-semi join = EXISTS: customers holding at least one open order. */
  val q5SemiJoin = NamedQuery(
    "q5_semi_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey"""),
    doc = "left-semi join (EXISTS); SURVEY §2.8")

  /** Left-anti join = NOT EXISTS: customers with no urgent orders. */
  val q6AntiJoin = NamedQuery(
    "q6_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""),
    doc = "left-anti join (NOT EXISTS); SURVEY §2.8")

  /** Window functions: top-3 orders per customer by value.  One shuffle on
    * the partition key; rank + filter stays inside whole-stage codegen. */
  val q7WindowTopPerGroup = NamedQuery(
    "q7_window_top_orders",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3
      ORDER BY o_custkey, rn"""),
    doc = "row_number window, top-N per group; SURVEY §2.8 window addition")

  /** Lag/lead window over event time: per-user gap between consecutive events. */
  val q7bWindowLag = NamedQuery(
    "q7b_window_lag",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // gaps in exact integer microseconds (epoch-seconds doubles lose µs
      // precision at 1.7e9 s and round() tie-breaks differ across engines);
      // integer DIV + /100.0 is bit-deterministic everywhere
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull && col("gap_us") > 3600L * 1000000L)
        .withColumn("gap_sec", expr("gap_us DIV 10000") / 100.0)
        .select(col("user_id"), col("event_id"), col("gap_sec"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id, (gap_us // 10000) / 100.0 AS gap_sec FROM (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                     (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS gap_us
        FROM events) t
      WHERE gap_us IS NOT NULL AND gap_us > 3600000000
      ORDER BY user_id, event_id"""),
    doc = "lag window over event time (sessionization gap detection)")

  /** Exact distinct aggregation. At 100 TB count(distinct) expands to a
    * two-stage aggregate; approx_count_distinct (HLL) is the scale path and is
    * covered by its own rows-only query in Analytics. */
  val q8Distinct = NamedQuery(
    "q8_distinct_users",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n_events,
      count(DISTINCT user_id) AS n_users,
      round(sum(value), 2) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type"""),
    doc = "exact distinct per group; SURVEY §2.8 distinct addition")

  /** Set operations: INTERSECT / EXCEPT (distinct semantics in both engines),
    * results unioned with a tag so one query covers all three ops. */
  val q9SetOps = NamedQuery(
    "q9_set_ops",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val open   = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val closed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val both   = open.intersect(closed).withColumn("tag", lit("both"))
      val onlyO  = open.except(closed).withColumn("tag", lit("only_open"))
      both.unionByName(onlyO)
        .select(col("tag"), col("o_custkey"))
        .orderBy(col("tag"), col("o_custkey"))
    },
    Some("""WITH open_c AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
           closed_c AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM closed_c)
      UNION ALL
      SELECT 'only_open' AS tag, o_custkey FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM closed_c)
      ORDER BY tag, o_custkey"""),
    doc = "intersect/except/union; SURVEY §2.8 set-op addition")

  /** Time-bucketed aggregation over the events stream table — the idiomatic
    * Spark form of the dashboard's sentiment timeline (SURVEY §2.7 O1, T6). */
  val q10TimeBucket = NamedQuery(
    "q10_time_bucket",
    (s, dir) => {
      // avg via exact integer cents + floor quantization: value has a 2dp
      // grain, so round(sum*100) is the same integer in any engine; the
      // division then feeds floor() the same double on both sides. Plain
      // round(avg(value), 4) diverges when the true average lands on a
      // decimal tie (Spark rounds the double's shortest decimal repr
      // HALF_UP, DuckDB rounds numerically — found at sf0.001).
      Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          (floor(round(sum(col("value")) * 100) / 100.0 / count(lit(1)) * 10000) / 10000.0)
            .as("avg_value"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
      count(*) AS n, round(sum(value), 2) AS sum_value,
      floor(round(sum(value) * 100) / 100.0 / count(*) * 10000) / 10000.0 AS avg_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""),
    doc = "time-bucketed agg (timeline parity, batch form of streaming window)")

  /** GROUP BY + HAVING over a join (grouped multi-agg with having, §2.8). */
  val q11Having = NamedQuery(
    "q11_having",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.avg4(col("o_totalprice"), 2).as("avg_price"))
        .filter(col("n_orders") > 20)
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))
    },
    Some("""SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
      floor(round(sum(o_totalprice) * 100) / 100.0 / count(*) * 10000) / 10000.0 AS avg_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
      HAVING count(*) > 20
      ORDER BY c_mktsegment, o_orderpriority"""),
    doc = "grouped multi-agg with HAVING; SURVEY §2.8")

  /** Sentiment-label thresholds (reference U2, CSJ:27–36) applied to a numeric
    * score derived from events.value — the oracle-checkable form of the label
    * UDF: score ≥ 0.05 → positive, ≤ −0.05 → negative, else neutral (null →
    * neutral via the otherwise branch, matching CSJ:29–30). */
  val q12CaseLabel = NamedQuery(
    "q12_sentiment_label_thresholds",
    (s, dir) => {
      val scored = Tables.events(s, dir)
        .withColumn("score", round((col("value") - lit(245.0)) / lit(245.0), 6))
      scored
        .withColumn("sentiment_label",
          when(col("score") >= 0.05, "positive")
            .when(col("score") <= -0.05, "negative")
            .otherwise("neutral"))
        .groupBy(col("sentiment_label"))
        .agg(count(lit(1)).as("n"), Exact.avg4(col("score"), 6).as("avg_score"))
        .orderBy(col("sentiment_label"))
    },
    Some("""SELECT CASE WHEN score >= 0.05 THEN 'positive'
                        WHEN score <= -0.05 THEN 'negative'
                        ELSE 'neutral' END AS sentiment_label,
      count(*) AS n,
      floor(round(sum(score) * 1000000) / 1000000.0 / count(*) * 10000) / 10000.0 AS avg_score
      FROM (SELECT round((value - 245.0) / 245.0, 6) AS score FROM events) t
      GROUP BY 1 ORDER BY sentiment_label"""),
    doc = "U2 label-threshold parity (CSJ:27–36) over a DuckDB-computable score")

  /** Second join path through supplier — revenue by supplying nation. */
  val q13SupplierNation = NamedQuery(
    "q13_supplier_nation",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n  = Tables.nation(s, dir)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
    doc = "supplier-side star join (broadcast)")

  /** Monthly order trend — coarse time series over the orders fact. */
  val q14MonthlyTrend = NamedQuery(
    "q14_monthly_orders",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("month"))
    },
    Some("""SELECT date_trunc('month', o_orderdate) AS month,
      count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1 ORDER BY month"""),
    doc = "monthly trend (timeline parity O1 over orders)")

  /** Semi-structured JSON extraction (the batch form of the pipeline's P2
    * from_json decode): pull a typed field out of the events.props JSON
    * string and aggregate it. */
  val q18JsonExtract = NamedQuery(
    "q18_json_extract",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(k) AS n_with_k,
      CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type ORDER BY event_type"""),
    doc = "JSON field extraction from props (P2 parity, batch form)")

  /** GROUPING SETS with grouping_id disambiguation — the generalized form
    * of rollup/cube, with the marker column making NULL-vs-subtotal rows
    * unambiguous. */
  val q19GroupingSets = NamedQuery(
    "q19_grouping_sets",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupingSets(
          Seq(Seq(col("c_mktsegment"), col("o_orderstatus")),
            Seq(col("c_mktsegment")), Seq()),
          col("c_mktsegment"), col("o_orderstatus"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },
    Some("""SELECT c_mktsegment, o_orderstatus,
      grouping(c_mktsegment) * 2 + grouping(o_orderstatus) AS gid,
      count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (c_mktsegment), ())
      ORDER BY gid, c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST"""),
    doc = "GROUPING SETS + grouping_id (subtotal disambiguation)")

  /** CUBE completes the subtotal family (ROLLUP q17, GROUPING SETS q19):
    * all 2ᵏ grouping combinations in one pass — Spark plans it as a
    * single Expand + hash aggregate, so the input is scanned once however
    * many subtotal levels are requested.  grouping_id disambiguates
    * subtotal NULLs from data NULLs; NULLS FIRST pinned on both engines. */
  val q29Cube = NamedQuery(
    "q29_cube",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("gid"), col("c_mktsegment").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },
    Some("""SELECT c_mktsegment, o_orderpriority,
      grouping(c_mktsegment) * 2 + grouping(o_orderpriority) AS gid,
      count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY CUBE (c_mktsegment, o_orderpriority)
      ORDER BY gid, c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST"""),
    doc = "CUBE over (segment, priority): all 4 grouping combinations, one Expand pass")

  /** FULL OUTER join — the one join type the pack lacked: reconciling two
    * sets that each have members the other misses (high-balance customers
    * vs customers-with-orders).  Both null sides are non-vacuous by
    * construction.  At scale a full outer shuffles both sides on the key
    * like any fact-fact join; the match-status rollup is a 3-row agg. */
  val q30FullOuter = NamedQuery(
    "q30_full_outer",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("spend"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .withColumn("match_status",
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
            .when(col("c_custkey").isNotNull, "customer_only")
            .otherwise("orders_only"))
        .groupBy(col("match_status"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("n_orders"), lit(0L))).as("total_orders"),
          round(sum(coalesce(col("spend"), lit(0.0))), 2).as("total_spend"))
        .orderBy(col("match_status"))
    },
    Some("""WITH c AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        o AS (SELECT o_custkey, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS spend
              FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
      SELECT CASE WHEN c_custkey IS NOT NULL AND o_custkey IS NOT NULL THEN 'both'
                  WHEN c_custkey IS NOT NULL THEN 'customer_only'
                  ELSE 'orders_only' END AS match_status,
        count(*) AS n,
        CAST(sum(coalesce(n_orders, 0)) AS BIGINT) AS total_orders,
        round(sum(coalesce(spend, 0)), 2) AS total_spend
      FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
      GROUP BY 1 ORDER BY match_status"""),
    doc = "FULL OUTER reconciliation: both / customer_only / orders_only rollup")

  /** Per-group top-k via the custom [[graft.functions.TopKAgg]] typed
    * aggregate instead of `row_number() OVER (...) <= k`: the window form
    * sorts every partition of the fact table; the aggregate keeps a
    * k-element heap per group with MAP-SIDE combine, so only k values per
    * group per mapper cross the shuffle.  PlanAudit asserts
    * ObjectHashAggregate and the absence of any Window node. */
  val q31TopKAgg = NamedQuery(
    "q31_topk_agg",
    (s, dir) => {
      graft.sentiment.GraftFunctions.register(s)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(call_function("graft_topk", col("o_totalprice"), lit(3)).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "price")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rank"), col("price"))
        .orderBy(col("c_mktsegment"), col("rank"))
    },
    Some("""WITH t AS (
        SELECT c_mktsegment,
          (list_sort(list(o_totalprice), 'DESC'))[1:3] AS top
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment)
      SELECT c_mktsegment, CAST(i AS INT) AS rank, top[CAST(i AS INT)] AS price
      FROM t, range(1, 4) r(i) WHERE i <= len(top)
      ORDER BY c_mktsegment, rank"""),
    doc = "per-group top-3 via a custom TypedImperativeAggregate (bounded heap, " +
      "map-side combine) — no window sort; oracle replays via sort-and-slice")

  /** Latest-record-per-key compaction — the CDC/upsert pattern every
    * lakehouse table maintenance job runs: collapse an event log to each
    * key's most recent row.  ONE `max_by(struct(...), ts)` aggregation
    * with map-side combine — no window sort, no self-join on max(ts).
    * (user_id, ts) is unique at micro precision at every SF, so the
    * ordering is unambiguous; a production variant adds an id tie-break
    * in the max_by ordering struct. */
  val q32LatestPerKey = NamedQuery(
    "q32_latest_per_key",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max_by(struct(col("event_id"), col("event_type"), col("value"), col("ts")),
            col("ts")).as("latest"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("latest.event_id").as("event_id"),
          col("latest.event_type").as("event_type"),
          col("latest.value").as("value"),
          col("latest.ts").as("ts"),
          col("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
        arg_max(event_id, ts) AS event_id,
        arg_max(event_type, ts) AS event_type,
        arg_max(value, ts) AS value,
        CAST(max(ts) AS TIMESTAMP) AS ts,
        count(*) AS n_events
      FROM events GROUP BY user_id ORDER BY user_id"""),
    doc = "latest record per key (CDC compaction) via max_by struct — one " +
      "shuffle, no window; oracle replays with arg_max")

  /** Exact percentiles (median / p90) per group — continuous interpolation,
    * same definition as DuckDB's quantile_cont.  (percentile_approx is the
    * sketch-based scale path; exact keeps the oracle meaningful.) */
  val q16Percentiles = NamedQuery(
    "q16_percentiles",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
      round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "exact continuous percentiles per group (p50/p90)")

  /** ROLLUP: hierarchical subtotals region → nation → grand total.  NULL
    * subtotal markers sort NULLS FIRST explicitly on both sides. */
  val q17Rollup = NamedQuery(
    "q17_rollup",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n  = Tables.nation(s, dir)
      val r  = Tables.region(s, dir)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 2).as("total_price"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some("""SELECT r_name, n_name, count(*) AS n_items,
      round(sum(l_extendedprice), 2) AS total_price
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""),
    doc = "ROLLUP subtotal hierarchy with explicit NULLS FIRST ordering")

  /** Correlated-subquery shape: orders priced above their customer's own
    * average.  Declaratively: a windowed average over the customer
    * partition (one shuffle), which is how the correlated form should
    * execute at scale anyway; the oracle states it as the correlated
    * subquery and DuckDB decorrelates it itself. */
  val q20CorrelatedAboveAvg = NamedQuery(
    "q20_above_customer_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("cnt", count(lit(1)).over(w))
        // per-row rounded cents summed as integers (the q39/q41 recipe):
        // order-independent at any partition size, vs rounding a windowed
        // double sum whose accumulation order differs between engines
        .withColumn("sum_e2", sum(round(col("o_totalprice") * 100).cast("long")).over(w))
        .filter(col("cnt") > 1 &&
          col("o_totalprice") > col("sum_e2") / 100.0 / col("cnt") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) > 1
        AND o_totalprice > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT)) / 100.0 / count(*)
                            FROM orders i WHERE i.o_custkey = o.o_custkey) * 1.5
      ORDER BY o_orderkey"""),
    doc = "correlated subquery (orders 1.5x above own customer's average), window-decorrelated")

  /** Pivot shape: one row per market segment, one column per order status
    * (conditional aggregation — the portable form of PIVOT). */
  val q22PivotStatus = NamedQuery(
    "q22_pivot_status",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    doc = "pivot via conditional aggregation (status columns per segment)")

  /** Ordered collect: per-region sorted nation roster as one string (the
    * portable, hash-stable form of array_agg/collect_list). */
  val q23StringAgg = NamedQuery(
    "q23_string_agg",
    (s, dir) => {
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      count(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
    doc = "ordered collect_list rendered as string (portable array_agg)")

  /** As-of join — an operator Spark lacks natively, composed from existing
    * ops per the custom-operator preference order (compose > custom plan):
    * for every error event, the most recent preceding click by the same
    * user.  One shuffle on the user key; `last(..., ignoreNulls)` over the
    * interleaved stream replaces the point-in-time lookup.  The oracle
    * states it as DuckDB's native ASOF JOIN. */
  val q24AsOfJoin = NamedQuery(
    "q24_asof_join",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "error"))
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("click_us",
          last(when(col("event_type") === "click", col("us")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error" && col("click_us").isNotNull)
        .withColumn("gap_sec", expr("(us - click_us) DIV 10000") / 100.0)
        .select(col("event_id"), col("user_id"), col("gap_sec"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
        ((e.us - c.us) // 10000) / 100.0 AS gap_sec
      FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
            FROM events WHERE event_type = 'error') e
      ASOF JOIN (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
                 FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.us >= c.us
      ORDER BY e.event_id"""),
    doc = "as-of join composed from window ops; oracle uses native ASOF JOIN")

  /** Range (band) join — non-equi predicate against a tiny in-line bands
    * table: with the bands side broadcast this is a single corpus scan
    * (BroadcastNestedLoopJoin), the right plan whenever one side is small;
    * DuckDB plans the same SQL through its IEJoin. */
  val q25RangeJoin = NamedQuery(
    "q25_range_join",
    (s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("negative", -10000.0, 0.0), ("low", 0.0, 2500.0),
        ("mid", 2500.0, 7500.0), ("high", 7500.0, 100000.0))
        .toDF("band", "lo", "hi")
      Tables.customer(s, dir)
        .join(broadcast(bands),
          col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("band"))
    },
    Some("""SELECT band, count(*) AS n_customers,
        round(sum(c_acctbal), 2) AS total_bal
      FROM customer
      JOIN (VALUES ('negative', -10000.0, 0.0), ('low', 0.0, 2500.0),
                   ('mid', 2500.0, 7500.0), ('high', 7500.0, 100000.0))
           AS bands(band, lo, hi)
        ON c_acctbal >= lo AND c_acctbal < hi
      GROUP BY band ORDER BY band"""),
    doc = "non-equi range/band join against a broadcast inline table")

  /** Sketch-based percentiles — the 100 TB path for q16 (exact percentile
    * needs a full sort per group; a sketch is mergeable and single-pass).
    * Spark's built-in `approx_percentile` t-digest would do, but its
    * estimate is JVM-internal and not engine-replayable, which would leave
    * this query rows-only at the oracle gate.  Instead: a FIXED-WIDTH
    * HISTOGRAM quantile sketch — the same sketch contract (one pass,
    * bounded state of range/W buckets, bucket counts merge by addition
    * across partitions/executors, error ≤ one bucket width, here $5,000 ≈
    * 2–4% of p50), but every step is exact integer arithmetic: cents grid
    * → bucket id (`DIV`), cumulative counts, ceil-rank targets
    * `(n+1) DIV 2` / `(9n+9) DIV 10`, first bucket whose cumulative count
    * reaches the rank, midpoint in integer cents.  DuckDB replays the
    * identical sketch, so the estimate itself is value-oracled — accuracy
    * vs exact q16 is additionally spec-pinned.  Scale shape: ONE shuffle
    * on (priority, bucket) with map-side combine; the per-priority window
    * runs over ~115 bucket rows, not the fact table. */
  val q26ApproxPercentiles = NamedQuery(
    "q26_approx_percentiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val W = 500000L // bucket width in cents ($5,000)
      val hist = Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          expr(s"CAST(round(o_totalprice * 100) AS BIGINT) DIV $W").as("b"))
        .groupBy(col("o_orderpriority"), col("b"))
        .agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("o_orderpriority"))
      hist
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("b"))).as("b50"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("b"))).as("b90"))
        .select(col("o_orderpriority"), col("n"),
          ((col("b50") * W + W / 2) / 100.0).as("p50_est"),
          ((col("b90") * W + W / 2) / 100.0).as("p90_est"),
          (col("b50") * W + W / 2).as("p50_cents"),
          (col("b90") * W + W / 2).as("p90_cents"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH h AS (
        SELECT o_orderpriority,
          CAST(round(o_totalprice * 100) AS BIGINT) // 500000 AS b,
          count(*) AS c
        FROM orders GROUP BY 1, 2),
      cum AS (
        SELECT o_orderpriority, b, c,
          sum(c) OVER (PARTITION BY o_orderpriority ORDER BY b) AS cum,
          sum(c) OVER (PARTITION BY o_orderpriority) AS n
        FROM h),
      pick AS (
        SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
          min(CASE WHEN cum >= (n + 1) // 2 THEN b END) AS b50,
          min(CASE WHEN cum >= (9 * n + 9) // 10 THEN b END) AS b90
        FROM cum GROUP BY o_orderpriority)
      SELECT o_orderpriority, n,
        (b50 * 500000 + 250000) / 100.0 AS p50_est,
        (b90 * 500000 + 250000) / 100.0 AS p90_est,
        CAST(b50 * 500000 + 250000 AS BIGINT) AS p50_cents,
        CAST(b90 * 500000 + 250000 AS BIGINT) AS p90_cents
      FROM pick ORDER BY o_orderpriority"""),
    doc = "fixed-width histogram quantile sketch (single-pass, mergeable " +
      "bucket counts, integer rank bounds) — deterministic engine-replayable " +
      "percentile estimates; accuracy vs exact q16 spec-pinned")

  /** Batch sessionization: 30-minute-gap sessions via a cumulative window
    * sum over per-user event time — the batch analog of the streaming
    * flatMapGroupsWithState sessionizer (graft.stream.Sessionize), and the
    * standard one-shuffle formulation at any scale. */
  val q15Sessionization = NamedQuery(
    "q15_sessionization",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // all time math in exact integer microseconds (see q7b/Exact): gap
      // comparison, per-session duration, and the final averages are then
      // identical in every engine
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("is_new")).over(run))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("dur_us"))
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          Exact.floorQ(sum(col("n_events")).cast("double") / count(lit(1)), 4).as("avg_events"),
          Exact.floorQ(sum(col("dur_us")).cast("double") / 1000000.0 / count(lit(1)), 4)
            .as("avg_duration_sec"))
        .orderBy(col("user_id"))
    },
    Some("""WITH flagged AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) > 1800000000
               OR lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) IS NULL
               THEN 1 ELSE 0 END AS is_new
        FROM events),
      numbered AS (
        SELECT user_id,
          sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_seq, us
        FROM flagged),
      sess AS (
        SELECT user_id, session_seq, count(*) AS n_events,
          max(us) - min(us) AS dur_us
        FROM numbered GROUP BY user_id, session_seq)
      SELECT user_id, count(*) AS n_sessions,
        floor(CAST(sum(n_events) AS DOUBLE) / count(*) * 10000) / 10000.0 AS avg_events,
        floor(CAST(sum(dur_us) AS DOUBLE) / 1000000.0 / count(*) * 10000) / 10000.0 AS avg_duration_sec
      FROM sess GROUP BY user_id ORDER BY user_id"""),
    doc = "30-min-gap sessionization via cumulative window sum; batch analog of streaming state")

  // ---------------------------------------------------------------- q21
  /** Sequential funnel — view → click → purchase per user, ordered by
    * event time.  One shuffle on user_id (conditional-min aggregation; no
    * self-joins, no windows), then a single-row summary — at scale the
    * funnel stage counts come out of one pass over events.  Stage
    * ordering compares exact integer microseconds; a user missing a stage
    * yields NULL, which the CASE/when treats as not-converted on both
    * engines. */
  val q21Funnel = NamedQuery(
    "q21_funnel",
    (s, dir) => {
      val us = unix_micros(col("ts"))
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", us)).as("t_view"),
          min(when(col("event_type") === "click", us)).as("t_click"),
          min(when(col("event_type") === "purchase", us)).as("t_purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L)).as("n_view_click"),
          sum(when(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"), 1L)
            .otherwise(0L)).as("n_full_funnel"))
    },
    Some("""WITH u AS (
        SELECT user_id,
          min(CASE WHEN event_type = 'view'
                   THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
          min(CASE WHEN event_type = 'click'
                   THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_click,
          min(CASE WHEN event_type = 'purchase'
                   THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_purchase
        FROM events GROUP BY user_id)
      SELECT count(*) AS n_users,
        CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      FROM u"""),
    doc = "sequential conversion funnel (view→click→purchase) via conditional-min " +
      "aggregation — one shuffle, no self-join")

  // ---------------------------------------------------------------- q28
  /** Sliding (hopping) event-time windows — 10-minute windows every
    * 5 minutes, the overlap semantics tumbling windows (q10) can't
    * express.  Spark's `window(ts, win, slide)` explodes each event into
    * win/slide buckets before the aggregation (here exactly 2); the
    * oracle replays the same explosion with integer-micros bucket
    * arithmetic (`(us // slide) * slide` and the one before it), so
    * window starts are epoch-aligned and hash-identical.  One shuffle on
    * (window, event_type) — the 2× row explosion happens map-side. */
  val q28HoppingWindow = NamedQuery(
    "q28_hopping_window",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("win_start"), col("event_type"))
    },
    Some("""WITH e AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value FROM events),
      x AS (
        SELECT event_type, value, us,
          unnest([(us // 300000000) * 300000000,
                  (us // 300000000) * 300000000 - 300000000]) AS ws
        FROM e)
      SELECT make_timestamp(ws) AS win_start, event_type,
        count(*) AS n, round(sum(value), 2) AS sum_value
      FROM x WHERE us >= ws AND us < ws + 600000000
      GROUP BY ws, event_type ORDER BY win_start, event_type"""),
    doc = "sliding 10-min/5-min event-time windows (overlapping buckets, map-side explode)")

  // ---------------------------------------------------------------- q27
  /** Event-time range scan over the events table.  With the current
    * TIMESTAMP(MICROS) encoding the range bounds push natively to the
    * parquet scan (PlanAudit asserts they arrive as `PushedFilters` on ts);
    * when `events.ts` ships as TIMESTAMP(NANOS) instead, [[Tables.events]]
    * reads it as a raw long and [[graft.plans.NanosFilterPushdown]] derives
    * the equivalent raw-nanos scan bounds — proved rule-on ≡ rule-off
    * row-for-row on a nanos fixture in NanosFilterPushdownSpec. */
  val q27EventTimePushdown = NamedQuery(
    "q27_event_time_pushdown",
    (s, dir) => {
      Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-11 00:00:00'
      GROUP BY event_type ORDER BY event_type"""),
    doc = "event-time range scan; bounds push to the parquet scan (native micros, " +
      "or via the raw-nanos optimizer rule for nanos sources)")

  /** Percentiles over a DETERMINISTIC hash sample — the oracle-checkable
    * scale path for percentile estimation complementing q26's histogram
    * sketch: q26 bounds error by value resolution (bucket width), the
    * sample bounds it statistically (rate); a fixed-rate md5-bucket
    * sample is engine-reproducible, so the whole estimate replays.  The
    * c5 acceptance technique: accept o_orderkey when the first 4 md5 hex
    * digits fall below 0x1999 (6553/65536 ≈ 10.0%) — one fused scan-side
    * predicate, no shuffle beyond the group agg, stable under
    * repartitioning and appends.  Sampled-vs-exact accuracy is pinned in
    * QueryPacksSpec against q16. */
  val q34SampledPercentiles = NamedQuery(
    "q34_sampled_percentiles",
    (s, dir) => {
      val h4 = substring(md5(concat(col("o_orderkey").cast("string"), lit(":q34"))), 1, 4)
      Tables.orders(s, dir)
        .filter(h4 < "1999")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_sampled"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_sampled,
        round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || ':q34'), 1, 4) < '1999'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "percentiles over a deterministic 10% md5-bucket sample — the " +
      "replayable approximate-percentile scale path (accuracy pinned vs q16)")

  /** SCD2-style validity intervals — the warehouse change-log pattern:
    * each record of a key's history is valid from its own timestamp until
    * the NEXT record's (lead window), open-ended on the latest.  Interval
    * arithmetic in exact integer microseconds (the q7b rule); per-type
    * rollup keeps the output small while exercising both the interval
    * construction and the open-tail accounting.  One shuffle on the key
    * for the window, one for the rollup. */
  val q35Scd2Intervals = NamedQuery(
    "q35_scd2_intervals",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("valid_to_us", lead(col("us"), 1).over(w))
        .withColumn("dur_us", col("valid_to_us") - col("us"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to_us").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(coalesce(col("dur_us"), lit(0L))).as("closed_dur_us"))
        .withColumn("closed_dur_sec", expr("closed_dur_us DIV 1000000"))
        .select(col("event_type"), col("n_versions"), col("n_open"), col("closed_dur_sec"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n_versions,
        CAST(sum(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        CAST(sum(coalesce(valid_to_us - us, 0)) AS BIGINT) // 1000000 AS closed_dur_sec
      FROM (
        SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                 (PARTITION BY user_id
                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS valid_to_us
        FROM events) t
      GROUP BY event_type ORDER BY event_type"""),
    doc = "SCD2 validity intervals via lead(): per-key history versions with " +
      "open-tail accounting, exact integer-microsecond durations")

  /** Weekly retention cohorts — the canonical product-analytics rollup:
    * cohort = a user's first active week, retention cell (cohort, offset)
    * = users from that cohort active `offset` weeks later.  Week ids in
    * exact integer arithmetic (`epoch µs DIV one week`).  NOTE the
    * cross-engine contract of this rule (shared by q37/q38/q39/s8):
    * Spark `DIV` truncates toward zero while DuckDB `//` floors, so the
    * two agree only for NON-NEGATIVE epochs — all graft event/order
    * timestamps are post-1970 by schema contract (TESTDATA.md, and any
    * production feed with sub-second event time).  A pre-1970 source
    * would need `floor(x / unit)` on both sides instead.  Scale shape:
    * one agg on user_id for cohorts (map-side combined), the distinct
    * (user, week) activity relation joins the (small) cohort relation on
    * the user key, then one rollup — the textbook two-shuffle cohort
    * plan. */
  val q36RetentionCohorts = NamedQuery(
    "q36_retention_cohorts",
    (s, dir) => {
      val WeekUs = 7L * 86400L * 1000000L
      val ue = Tables.events(s, dir)
        .select(col("user_id"),
          expr(s"unix_micros(ts) DIV $WeekUs").as("week"))
        .distinct()
      val cohorts = ue.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      ue.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH ue AS (
        SELECT DISTINCT user_id,
          epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
        FROM events),
      cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM ue GROUP BY user_id)
      SELECT cohort_week, week - cohort_week AS week_offset,
        count(DISTINCT ue.user_id) AS n_users
      FROM ue JOIN cohorts ON ue.user_id = cohorts.user_id
      GROUP BY cohort_week, week_offset
      ORDER BY cohort_week, week_offset"""),
    doc = "weekly retention cohorts (first-active-week × offset), integer week ids")

  /** Rank-family windows (ntile / percent_rank / cume_dist) — the
    * remaining §2.7 "window-like" forms q7/q7b/q15/q20 don't cover.
    * Quartile assignment and both rank ratios ride ONE window (one
    * shuffle on the partition key); the summary agg then reduces each
    * (priority, quartile) cell.  percent_rank/cume_dist are exact
    * rationals `k/(n−1)`, `k/n` — a single IEEE division, identical in
    * both engines; max() of them is order-free, and the 6-dp floor (never
    * round — round's .5 tie rule differs across engines) keeps the
    * comparison bit-stable. */
  val q33RankFamily = NamedQuery(
    "q33_rank_family",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .groupBy(col("o_orderpriority"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          (floor(max(col("pr")) * 1000000) / 1000000.0).as("max_pr"),
          (floor(max(col("cd")) * 1000000) / 1000000.0).as("max_cd"))
        .orderBy(col("o_orderpriority"), col("quartile"))
    },
    Some("""SELECT o_orderpriority, CAST(quartile AS INTEGER) AS quartile, count(*) AS n,
        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        floor(max(pr) * 1000000) / 1000000.0 AS max_pr,
        floor(max(cd) * 1000000) / 1000000.0 AS max_cd
      FROM (SELECT o_orderpriority, o_totalprice,
              ntile(4) OVER w AS quartile,
              percent_rank() OVER w AS pr,
              cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)) t
      GROUP BY o_orderpriority, quartile
      ORDER BY o_orderpriority, quartile"""),
    doc = "ntile/percent_rank/cume_dist in one window pass; quartile summary per priority")

  /** Gaps-and-islands — maximal runs of consecutive active DAYS per user
    * (activity streaks), the classic sequential-grouping pattern SQL
    * can't express with plain GROUP BY: island id = day − row_number,
    * constant exactly while days are consecutive.  Day ids in exact
    * integer arithmetic (`epoch µs DIV one day`, the q36 rule — which
    * assumes non-negative epochs; see q36's note).  Scale
    * shape: the distinct and the window share ONE shuffle on user_id
    * (distinct keys (user, day) hash-partition by user prefix only after
    * an explicit repartition — here the window's user_id partitioning
    * subsumes it), then one small rollup on streak length. */
  val q37GapsIslands = NamedQuery(
    "q37_gaps_islands",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak_len"))
        .groupBy(col("streak_len"))
        .agg(count(lit(1)).as("n_streaks"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("streak_len"))
    },
    Some("""WITH ud AS (
        SELECT DISTINCT user_id,
          epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        FROM events),
      isl AS (
        SELECT user_id,
          day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM ud),
      streaks AS (
        SELECT user_id, grp, count(*) AS streak_len
        FROM isl GROUP BY user_id, grp)
      SELECT streak_len, count(*) AS n_streaks,
        count(DISTINCT user_id) AS n_users
      FROM streaks GROUP BY streak_len ORDER BY streak_len"""),
    doc = "gaps-and-islands: consecutive-day activity streaks per user " +
      "(island id = day - row_number), streak-length distribution")

  /** Sweep-line maximum concurrency — peak simultaneously-open intervals
    * per group, the event-boundary counting pattern (unpivot each
    * interval to a +1 start / −1 end point, running-sum the deltas in
    * time order, take the max).  Intervals are half-open 30-day order
    * fulfillment windows `[orderdate, orderdate+30d)` in integer days, so
    * an order ending on day X never overlaps one starting on day X — the
    * `ORDER BY day, delta` tie rule (−1 sorts first) encodes exactly
    * that.  The running sum's default RANGE frame includes all peers of
    * the current (day, delta), making the cumulative value — and its max
    * — independent of intra-tie processing order in both engines.  Scale
    * shape: one window shuffle on the (low-cardinality) group key; at
    * 100 TB the same sweep runs per finer-grained key (user, region) with
    * identical plan shape. */
  val q38MaxConcurrent = NamedQuery(
    "q38_max_concurrent",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400L * 1000000L
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          // o_orderdate is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (UTC session)
          expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV $DayUs").as("d0"))
      val points = o.select(col("o_orderpriority"), col("d0").as("day"), lit(1).as("delta"))
        .unionAll(o.select(col("o_orderpriority"), (col("d0") + 30).as("day"), lit(-1).as("delta")))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"), col("delta"))
      points
        .withColumn("open_now", sum(col("delta")).over(w))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("open_now")).as("max_in_flight"),
          (count(lit(1)) / 2).cast("long").as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH o AS (
        SELECT o_orderpriority,
          epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS d0
        FROM orders),
      points AS (
        SELECT o_orderpriority, d0 AS day, 1 AS delta FROM o
        UNION ALL
        SELECT o_orderpriority, d0 + 30 AS day, -1 AS delta FROM o),
      sweep AS (
        SELECT o_orderpriority,
          sum(delta) OVER (PARTITION BY o_orderpriority
                           ORDER BY day, delta) AS open_now
        FROM points)
      SELECT o_orderpriority,
        CAST(max(open_now) AS BIGINT) AS max_in_flight,
        CAST(count(*) / 2 AS BIGINT) AS n_orders
      FROM sweep GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "sweep-line peak concurrency: max simultaneously-open 30-day order " +
      "windows per priority (+1/-1 boundary deltas, running sum, max)")

  /** Frame-bounded rolling aggregate — the 7-day moving average over each
    * priority's daily order-revenue series, via an explicit ROWS frame
    * (`ROWS BETWEEN 6 PRECEDING AND CURRENT ROW`) — the one §2.7 window
    * form the other window queries don't exercise (q7/q33 rank frames,
    * q7b offset frames, q35 lead).  Money stays exact: daily totals are
    * per-row-rounded to integer cents (Exact.sumGrainExact), the frame
    * sum is integer, and only the final display average divides — the
    * same IEEE ops on the same inputs in both engines, then the tie-free
    * 4-dp floor.  Scale shape: one shuffle for the daily rollup on
    * (priority, day), one for the window on priority; day is unique per
    * partition after the rollup, so the ROWS frame is deterministic. */
  val q39MovingAvg = NamedQuery(
    "q39_moving_avg",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val DayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV $DayUs").as("day"),
          col("o_totalprice"))
        .groupBy(col("o_orderpriority"), col("day"))
        .agg(Exact.sumGrainExact(col("o_totalprice"), 2).as("day_cents"))
        .withColumn("mov_n", count(lit(1)).over(w))
        .withColumn("mov_avg",
          Exact.floorQ(sum(col("day_cents")).over(w) / 100.0 / col("mov_n"), 4))
        .select(col("o_orderpriority"), col("day"), col("day_cents"),
          col("mov_n"), col("mov_avg"))
        .orderBy(col("o_orderpriority"), col("day"))
    },
    Some("""WITH daily AS (
        SELECT o_orderpriority,
          epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS day_cents
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, day, day_cents,
        count(*) OVER w AS mov_n,
        floor(sum(day_cents) OVER w / 100.0 / count(*) OVER w * 10000) / 10000.0 AS mov_avg
      FROM daily
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY o_orderpriority, day"""),
    doc = "7-day moving average of daily revenue per priority via an explicit " +
      "ROWS frame; integer-cent arithmetic until the final tie-free display division")

  /** Robust statistics — median, MAD (median absolute deviation) and IQR
    * per group, the outlier-resistant dispersion measures a data-quality
    * monitor prefers over mean/stddev.  MAD needs TWO ordered passes
    * (median first, then deviations from it): the per-group medians are a
    * tiny aggregate broadcast back to the scan (the c8 pattern), never a
    * re-sort of the fact table.
    *
    * Cross-engine exactness by DYADIC arithmetic: prices are recovered to
    * exact integer cents, and every percentile interpolation point lands
    * on rank fractions ∈ {0, ¼, ½, ¾} — so medians are exact multiples
    * of ½, deviations of ½, MADs of ¼, IQRs of ¼: all binary-exact
    * doubles, immune to interpolation-formula and summation-order
    * differences.  No rounding anywhere. */
  val q40RobustStats = NamedQuery(
    "q40_robust_stats",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).as("cents"))
      val med = o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(cents, 0.5)").as("med_cents"),
          expr("percentile(cents, 0.25)").as("q1_cents"),
          expr("percentile(cents, 0.75)").as("q3_cents"))
      o.join(broadcast(med), "o_orderpriority")
        .withColumn("dev", abs(col("cents") - col("med_cents")))
        .groupBy(col("o_orderpriority"))
        .agg(first(col("n")).as("n"),
          first(col("med_cents")).as("med_cents"),
          expr("percentile(dev, 0.5)").as("mad_cents"),
          (first(col("q3_cents")) - first(col("q1_cents"))).as("iqr_cents"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH o AS (
        SELECT o_orderpriority, round(o_totalprice * 100) AS cents
        FROM orders),
      med AS (
        SELECT o_orderpriority, count(*) AS n,
          quantile_cont(cents, 0.5) AS med_cents,
          quantile_cont(cents, 0.25) AS q1_cents,
          quantile_cont(cents, 0.75) AS q3_cents
        FROM o GROUP BY o_orderpriority)
      SELECT o.o_orderpriority, any_value(n) AS n,
        any_value(med_cents) AS med_cents,
        quantile_cont(abs(cents - med_cents), 0.5) AS mad_cents,
        any_value(q3_cents) - any_value(q1_cents) AS iqr_cents
      FROM o JOIN med USING (o_orderpriority)
      GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""),
    doc = "robust stats per group: median / MAD / IQR in dyadic-exact integer-" +
      "cent arithmetic (broadcast medians back to the scan, no second sort " +
      "of the fact table)")

  /** Robust outlier detection — the data-quality monitor built on q40's
    * dispersion measures: an event is an outlier when its value deviates
    * from its type's median by more than 3× the MAD (the Hampel filter /
    * robust z-score, public statistics literature — unlike mean±3σ it
    * does not let the outliers inflate their own threshold).  Same
    * dyadic-exact arithmetic as q40: integer cents, medians on the
    * ½-grid, MADs on the ¼-grid, 3·MAD on the ¾-grid — every comparison
    * is between binary-exact doubles, so the flag replays bit-identically
    * in DuckDB.  Scale shape: two tiny per-type aggregates broadcast back
    * to the scan (the q40/c8 pattern — the fact table is never re-sorted
    * or re-shuffled), then one count rollup per type. */
  val q42OutlierMad = NamedQuery(
    "q42_outlier_mad",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_type"), round(col("value") * 100).as("cents"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(cents, 0.5)").as("med_cents"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("cents") - col("med_cents")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(adev, 0.5)").as("mad_cents"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(col("med_cents")).as("med_cents"),
          first(col("mad_cents")).as("mad_cents"),
          sum(when(col("adev") > lit(3.0) * col("mad_cents"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_bp", expr("n_outliers * 10000 DIV n"))
        .orderBy(col("event_type"))
    },
    Some("""WITH e AS (
        SELECT event_type, round(value * 100) AS cents FROM events),
      med AS (
        SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
        FROM e GROUP BY 1),
      d AS (
        SELECT e.event_type, med_cents, abs(cents - med_cents) AS adev
        FROM e JOIN med USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_cents
        FROM d GROUP BY 1)
      SELECT d.event_type, count(*) AS n,
        any_value(d.med_cents) AS med_cents,
        any_value(mad.mad_cents) AS mad_cents,
        CAST(sum(CASE WHEN adev > 3.0 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
          AS n_outliers,
        CAST(sum(CASE WHEN adev > 3.0 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
          * 10000 // count(*) AS outlier_bp
      FROM d JOIN mad USING (event_type)
      GROUP BY d.event_type ORDER BY d.event_type"""),
    doc = "Hampel-filter outlier detection per event type (|value − median| " +
      "> 3·MAD) in dyadic-exact cents — broadcast thresholds, no fact re-sort; " +
      "FULL value oracle")

  /** UNPIVOT / melt — the wide→long reshaping inverse of q22's pivot:
    * lineitem's four measure columns become (measure, value) rows via one
    * map-side `stack` generator (no shuffle to reshape — the only
    * exchange is the final rollup's).  The long form is what metric
    * stores and chart layers consume; at 100 TB the generator multiplies
    * rows 4× but never widens the shuffle beyond (flag, measure) partial
    * aggregates. */
  val q41Unpivot = NamedQuery(
    "q41_unpivot",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .selectExpr("l_returnflag",
          """stack(4,
               'quantity', l_quantity,
               'extendedprice', l_extendedprice,
               'discount', l_discount,
               'tax', l_tax) AS (measure, v)""")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"),
          // All four measures sit on the 2-dp grid, so each row rounds to
          // exact integer cents and the group total is an exact BIGINT sum
          // (Exact.sumGrainExact) — order-independent on BOTH engines at
          // any group size, not just while the double-sum error stays
          // under half a cent.
          Exact.sumGrainExact(col("v"), 2).as("total_cents"))
        .withColumn("total", col("total_cents") / 100.0)
        .orderBy(col("l_returnflag"), col("measure"))
    },
    Some("""WITH m AS (
        SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
        UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
      SELECT l_returnflag, measure, count(*) AS n,
        CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
      FROM m GROUP BY l_returnflag, measure
      ORDER BY l_returnflag, measure"""),
    doc = "UNPIVOT via one map-side stack generator: wide measure columns to " +
      "long (measure, value) rows, rolled up per (flag, measure)")

  def all: Seq[NamedQuery] = Seq(
    q15Sessionization, q16Percentiles, q17Rollup, q18JsonExtract,
    q19GroupingSets, q20CorrelatedAboveAvg, q22PivotStatus, q23StringAgg,
    q21Funnel, q24AsOfJoin, q25RangeJoin, q26ApproxPercentiles, q27EventTimePushdown,
    q28HoppingWindow, q29Cube, q30FullOuter, q31TopKAgg, q32LatestPerKey,
    q33RankFamily, q34SampledPercentiles, q35Scd2Intervals, q36RetentionCohorts,
    q37GapsIslands, q38MaxConcurrent, q39MovingAvg, q40RobustStats, q41Unpivot,
    q42OutlierMad,
    q1PricingSummary, q2FilterPushdown, q3StarJoin, q4TopCustomers,
    q5SemiJoin, q6AntiJoin, q7WindowTopPerGroup, q7bWindowLag,
    q8Distinct, q9SetOps, q10TimeBucket, q11Having, q12CaseLabel,
    q13SupplierNation, q14MonthlyTrend)
}
