package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Salting must never change results — only the shuffle distribution. */
class SkewSpec extends SparkSpec {

  test("salted join ≡ plain join (orders ⋈ customer)") {
    val o = Tables.orders(spark, sf()).withColumnRenamed("o_custkey", "c_custkey")
    val c = Tables.customer(spark, sf())
    val plain = o.join(c, Seq("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(o, c, "c_custkey", 8, Seq("o_orderkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted two-phase count ≡ plain count, even on a hot key") {
    import spark.implicits._
    // 90% of rows share one key — the classic straggler shape
    val hot = (1 to 9000).map(i => ("hot", i)) ++ (1 to 1000).map(i => (s"k${i % 50}", i))
    val df = hot.toDF("k", "v")
    val plain = df.groupBy($"k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", 16, Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("hot") == 9000L)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in final plan)") {
    import spark.implicits._
    // the other half of the skew toolkit: salting is the planned fix,
    // AQE skew-join is the runtime fix — demonstrate it actually fires
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 90% of fact rows share one key → one reducer partition ≫ the
      // others.  Payloads are seeded-random so the lz4-compressed shuffle
      // partition sizes AQE measures reflect the skew (a constant pad
      // compresses to almost nothing and defeats the threshold).
      val rng = new scala.util.Random(1)
      val fact = (1 to 120000)
        .map(i => (if (i % 10 != 0) 1L else (i % 1000).toLong,
          rng.alphanumeric.take(64).mkString))
        .toDF("k", "payload")
      val dim = (0L to 1000L).map(k => (k, s"dim-$k")).toDF("k", "dv")
      val joined = fact.join(dim, "k")
      joined.queryExecution.toRdd.count(): Unit // execute THIS plan to finality
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${finalPlan.take(1500)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("salt is deterministic and bounded") {
    import spark.implicits._
    val df = (1 to 1000).toDF("v")
      .withColumn("s", Skew.salt(8, col("v")))
    val range = df.agg(min(col("s")), max(col("s"))).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 7)
    val again = (1 to 1000).toDF("v").withColumn("s", Skew.salt(8, col("v")))
    assert(df.collect().toSeq == again.collect().toSeq)
  }
}
