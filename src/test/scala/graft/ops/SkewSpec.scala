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
