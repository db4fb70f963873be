package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audit: prints `explain("formatted")` for the headline
  * queries and greps each plan for the markers that must hold at scale —
  * parquet filter pushdown, pruned read schemas, broadcast joins on dims,
  * partial aggregation, whole-stage codegen, top-k via
  * TakeOrderedAndProject.  Run:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01"
  *
  * Exits non-zero if an expectation fails, so it can gate commits.
  */
object PlanAudit {

  final case class Expect(query: String, marker: String, why: String)

  val expectations: Seq[Expect] = Seq(
    Expect("q2_filter_pushdown", "PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_shipdate), GreaterThanOrEqual(l_quantity,49.0)",
      "selective predicates must reach the parquet scan"),
    Expect("q2_filter_pushdown", "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double",
      "only the 4 projected columns (+filter cols) may be read"),
    Expect("q1_pricing_summary", "HashAggregate",
      "partial+final hash aggregation (map-side combine)"),
    Expect("q1_pricing_summary", "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate,",
      "date filter must push to parquet"),
    Expect("q3_star_join_revenue", "BroadcastHashJoin",
      "dims must broadcast, not shuffle"),
    Expect("q4_top_customers", "TakeOrderedAndProject",
      "top-k must not global-sort"),
    Expect("q5_semi_join", "LeftSemi",
      "EXISTS must plan as a semi join"),
    Expect("q7_window_top_orders", "Window",
      "window function over one shuffle on the partition key"),
    Expect("s1_ann_bruteforce", "BroadcastNestedLoopJoin",
      "query side must broadcast; corpus scanned once"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failed = 0
    val byQuery = expectations.groupBy(_.query)
    byQuery.toSeq.sortBy(_._1).foreach { case (name, exps) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      exps.foreach { e =>
        val ok = plan.contains(e.marker)
        if (!ok) failed += 1
        println(s"${if (ok) "OK  " else "FAIL"} $name :: ${e.marker.take(60)}  (${e.why})")
        if (!ok) {
          println("---- plan ----")
          println(plan)
        }
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
