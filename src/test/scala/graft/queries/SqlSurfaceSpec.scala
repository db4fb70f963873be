package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** The `spark.sql` API surface (SURVEY §1.1): the engine is usable from
  * plain SQL over registered views, not only through the DataFrame DSL.
  *
  * The strongest form of that claim is running the ANSI-portable oracle
  * strings THEMSELVES on Spark SQL and comparing to the DataFrame plans —
  * the same text then executes identically on three engines (Spark SQL,
  * DuckDB via the driver gate, and the DataFrame DSL).  Only queries whose
  * oracle avoids DuckDB-specific functions qualify; a handful across the
  * main shapes (agg, window, semi-join, top-k, set-op) is plenty to pin
  * the surface.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val portable = Seq(
    "a3_type_distribution",  // group + count + order
    "a5_source_top10",       // group + top-k LIMIT
    "q5_semi_join",          // EXISTS / IN-subquery semi-join
    "q7_window_top_orders",  // row_number window
    "q9_set_ops",            // INTERSECT / EXCEPT
    "q11_having")            // HAVING

  test("ANSI-portable oracle SQL runs verbatim on spark.sql and matches the DataFrame plans") {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings").foreach { t =>
      Tables.load(spark, sf(), t).createOrReplaceTempView(t)
    }
    // events via the loader (nanos → micros conversion), like every query
    Tables.events(spark, sf()).createOrReplaceTempView("events")
    portable.foreach { name =>
      val sql = SparkEntry.oracleSql(name)
        // the one dialect seam: DuckDB spells the micros-floor conversion
        // CAST(ts AS TIMESTAMP); the view already holds the converted ts
        .replace("CAST(ts AS TIMESTAMP)", "ts")
      // SQL literals like 10000.0 type as DECIMAL where the DSL used a
      // DOUBLE lit — same values, different type; compare numerically
      def norm(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[Any]] =
        rows.toSeq.map(_.toSeq.map {
          case d: java.math.BigDecimal => d.doubleValue
          case x => x
        })
      val viaSql = norm(spark.sql(sql).collect())
      val viaDf = norm(SparkEntry.queries(name)(spark, sf()).collect())
      assert(viaSql == viaDf,
        s"$name: spark.sql result diverges from the DataFrame plan")
    }
  }
}
