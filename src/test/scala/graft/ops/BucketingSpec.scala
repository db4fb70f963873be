package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Bucketing demonstration: pre-bucketing both join sides on the join key
  * removes the shuffle entirely (the co-located-join technique for repeated
  * large-fact joins at scale).  Asserts on the physical plan, not vibes:
  * the bucketed join must contain NO shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ customer joins without a shuffle exchange") {
    // tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    // static conf and cannot be moved on the shared test session
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables.orders(spark, sf()).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf())
      .withColumn("c_custkey", col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      assert(joined.count() ==
        Tables.orders(spark, sf()).join(Tables.customer(spark, sf()),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
