package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins the dashboard-repair semantics (DSA:183–252) from FIXTURES.md §1's
  * degraded-record cases: missing numerics → 0, missing strings → their
  * documented defaults, null hashtags → empty list. */
class RepairSpec extends SparkSpec {

  test("repair fills the dashboard defaults (P9/P10/F7)") {
    val schema = StructType(Seq(
      StructField("user", StringType, true),
      StructField("platform", StringType, true),
      StructField("country", StringType, true),
      StructField("likes", IntegerType, true),
      StructField("sentiment_score", FloatType, true),
      StructField("sentiment_label", StringType, true),
      StructField("hashtags", ArrayType(StringType), true)))
    val rows = java.util.Arrays.asList(
      Row(null, null, null, null, null, null, null),
      Row("u1", "twitter", "USA", 5, 0.5f, "positive", Seq("a")))
    val df = Repair.repair(spark.createDataFrame(rows, schema))
    val r = df.filter(col("user") === "anonymous").head()
    assert(r.getString(1) == "unknown")      // platform
    assert(r.getString(2) == "Unknown")      // country
    assert(r.getDouble(3) == 0.0)            // likes coerced + filled
    assert(r.getDouble(4) == 0.0)            // sentiment_score
    assert(r.getString(5) == "neutral")      // sentiment_label
    assert(r.getSeq[String](6).isEmpty)      // hashtags → []
    // intact rows pass through unchanged (modulo numeric widening)
    val ok = df.filter(col("user") === "u1").head()
    assert(ok.getDouble(3) == 5.0 && ok.getString(5) == "positive")
  }

  test("repair is a no-op on columns that are absent") {
    import spark.implicits._
    val df = Seq(("x", 1)).toDF("some_col", "other")
    assert(Repair.repair(df).collect().toSeq == df.collect().toSeq)
  }
}
