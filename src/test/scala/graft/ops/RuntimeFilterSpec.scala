package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning — Catalyst's InjectRuntimeFilter: a
  * selective filter on one join side materializes a Bloom filter that is
  * pushed into the OTHER side's scan as a semi-join predicate, cutting the
  * fact side's post-scan volume before the shuffle.  At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~1% that can possibly match a filtered dimension.  The thresholds are
  * sized for real tables, so the spec lowers them to fire at test SFs —
  * the assertion is on the plan AND on result identity with the feature
  * off. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom filter into the fact-side scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      def query() = {
        val li = Tables.lineitem(spark, sf())
        val o = Tables.orders(spark, sf())
          .filter(col("o_orderpriority") === "1-URGENT")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("total"))
      }
      val withFilter = query()
      val plan = withFilter.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"no bloom runtime filter injected:\n$plan")
      val rows = withFilter.collect().map(_.toString).toSeq

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val rowsOff = query().collect().map(_.toString).toSeq
      assert(rows == rowsOff, "bloom filter changed the results")
      assert(rows.nonEmpty)
    } finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(v => spark.conf.set(k, v))
    }
  }
}
