package graft.ops

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** 100 TB data-layout demonstration (see README "Data layout at scale"):
  * the events table partitioned by event date so that date-range queries
  * prune whole partition directories BEFORE any I/O.  This composes with
  * the NanosFilterPushdown rule: partition pruning skips days, and the
  * derived raw-nanos bounds then skip row groups WITHIN the surviving
  * days.  Asserts on file counts from the scan's own metrics, not vibes. */
class LayoutSpec extends SparkSpec {

  /** Executes the DataFrame's exact physical plan (no extra agg on top)
    * and returns its scan node's numFiles metric.  A filter+scan plan has
    * no exchange, so AQE never wraps it and the leaf is the scan itself. */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val qe = df.queryExecution
    qe.toRdd.count(): Unit // run THIS plan so its metrics populate
    qe.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScanExec in plan"))
      .metrics("numFiles").value
  }

  test("date-partitioned events: a one-day filter reads one partition's files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    try {
      // lay out events as a date-partitioned table — the production layout
      // for an append-only event log (one directory per day)
      Tables.events(spark, sf())
        .withColumn("event_date", to_date(col("ts")))
        .write.partitionBy("event_date").mode("overwrite").parquet(dir)

      val days = spark.read.parquet(dir)
        .select(col("event_date")).distinct().count()
      assert(days > 1, s"need >1 partition for a pruning test, got $days")

      val all = spark.read.parquet(dir)
      val oneDay = all.filter(col("event_date") === lit("2024-01-10"))
      assert(oneDay.count() > 0, "probe day must exist in the testdata")

      // partition filter must appear in the plan, and the scan must touch
      // strictly fewer files than the unfiltered table has
      val plan = oneDay.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), s"no partition filter:\n$plan")

      val totalFiles = filesRead(all)
      val readFiles = filesRead(oneDay)
      assert(readFiles > 0)
      assert(readFiles < totalFiles,
        s"pruning read $readFiles of $totalFiles files — no partition was skipped")
      // with one directory per day, a one-day filter reads ~1/days of them
      assert(readFiles <= totalFiles / (days - 1),
        s"read $readFiles files of $totalFiles across $days days — pruning too weak")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
