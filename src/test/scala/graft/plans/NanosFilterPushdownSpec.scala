package graft.plans

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rule must be (a) effective — bounds reach the parquet
  * scan — and (b) invisible — identical rows with the rule excluded, for
  * every comparison shape and orientation it rewrites.
  *
  * The driver testdata now ships events.ts as TIMESTAMP(MICROS) (which
  * pushes down natively, no rule needed — LayoutSpec/PlanAudit cover that
  * path), so this spec materializes its own raw-long-NANOS copy of the
  * events table — the physical form the rule exists for — and reads it
  * through the exact [[Tables.events]] legacy conversion shape. */
class NanosFilterPushdownSpec extends SparkSpec {

  private val ExcludeKey = "spark.sql.optimizer.excludedRules"

  /** events with ts as raw int64 nanoseconds, written once per suite run. */
  private lazy val nanosDir: String = {
    val path = java.nio.file.Files.createTempDirectory("graft-nanos")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(path))
        Files.walk(path).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p): Unit)
    }))
    // Deterministic nonzero sub-micro remainder (pmod(event_id, 1000)) so
    // the file-based rule-on/rule-off parity tests exercise nanos that do
    // NOT floor to themselves — the original NANOS testdata had such values
    // and a *1000-only fixture would leave them covered solely by the
    // synthetic boundary matrix.
    Tables.events(spark, sf())
      .withColumn("ts", expr("unix_micros(ts) * 1000L + pmod(event_id, 1000L)"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    path.toString
  }

  /** The legacy nanos read path: raw long scan + floor-to-micros DIV —
    * identical to what [[Tables.events]] does when it meets a long ts. */
  private def nanosEvents: DataFrame =
    spark.read.parquet(s"$nanosDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  private def withRuleOff[A](body: => A): A = {
    val prev = spark.conf.getOption(ExcludeKey)
    try {
      spark.conf.set(ExcludeKey, NanosFilterPushdown.ruleName)
      body
    } finally prev match {
      case Some(v) => spark.conf.set(ExcludeKey, v)
      case None    => spark.conf.unset(ExcludeKey)
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def filtered(cond: org.apache.spark.sql.Column): DataFrame =
    nanosEvents.filter(cond).select(col("event_id"))

  private val t0 = lit("2024-01-10 00:00:00").cast("timestamp")
  private val midTs = lit("2024-01-15 12:34:56.789012").cast("timestamp")

  test("bounds are pushed to the parquet scan") {
    val plan = filtered(col("ts") >= t0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,1704844800000000000)"), plan)
  }

  test("rule-off plans carry no raw-nanos bound (the rule is what adds it)") {
    val plan = withRuleOff {
      filtered(col("ts") >= t0).queryExecution.executedPlan.toString
    }
    assert(!plan.contains("1704844800000000000"), plan)
  }

  test("every comparison shape returns identical rows with the rule excluded") {
    val conds = Seq(
      col("ts") >= t0, col("ts") > t0, col("ts") <= t0, col("ts") < t0,
      col("ts") === midTs,
      // literal-on-the-left orientations
      t0 <= col("ts"), t0 > col("ts"),
      // conjunction of both bounds (the range-scan shape)
      col("ts") >= t0 && col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
    conds.zipWithIndex.foreach { case (cond, i) =>
      val on = rows(filtered(cond))
      val off = withRuleOff(rows(filtered(cond)))
      assert(on == off, s"cond #$i diverged: on=${on.size} off=${off.size} rows")
    }
  }

  test("date_trunc day-equality derives scan bounds and keeps row parity") {
    val day = lit("2024-01-10 00:00:00").cast("timestamp")
    val cond = date_trunc("day", col("ts")) === day
    val plan = filtered(cond).queryExecution.executedPlan.toString
    // lower bound is the day start in nanos; upper is conservative (+25h)
    assert(plan.contains("GreaterThanOrEqual(ts,1704844800000000000)"), plan)
    assert(plan.contains("LessThanOrEqual(ts,"), plan)
    val on = rows(filtered(cond))
    val off = withRuleOff(rows(filtered(cond)))
    assert(on == off && on.nonEmpty, s"on=${on.size} off=${off.size}")
    // the bounds must not clip the bucket edges: day-equality row set ==
    // explicit [day, day+1d) range row set
    val range = rows(filtered(col("ts") >= day &&
      col("ts") < lit("2024-01-11 00:00:00").cast("timestamp")))
    assert(on == range)
  }

  test("exhaustive boundary matrix: no operator drops a row at any nanos remainder") {
    import spark.implicits._
    // the rule fires on ANY timestamp_micros(x DIV 1000) filter, not just
    // the events scan — craft nanos values straddling every interesting
    // boundary: each micro adjacent to the literal, at remainders
    // {-1, 0, +1, +999, +1000} nanos, plus epoch-adjacent values
    val m = 1704844800000000L // 2024-01-10 00:00:00 UTC in micros
    val nanos = ((for {
      base <- Seq(m - 1, m, m + 1)
      r <- Seq(-1L, 0L, 1L, 999L, 1000L)
    } yield base * 1000L + r) ++ Seq(0L, 1L, 999L, 1000L)).distinct
    val df = nanos.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw DIV 1000")))
    val tm = timestamp_micros(lit(m))
    val day = lit("2024-01-10 00:00:00").cast("timestamp")
    val conds = Seq(
      col("ts") >= tm, col("ts") > tm, col("ts") <= tm, col("ts") < tm,
      col("ts") === tm, tm <= col("ts"), tm > col("ts"), tm === col("ts"),
      date_trunc("day", col("ts")) === day,
      date_trunc("day", col("ts")) <= day, date_trunc("day", col("ts")) > day)
    conds.zipWithIndex.foreach { case (cond, i) =>
      val on = df.filter(cond).select(col("raw")).collect().map(_.getLong(0)).sorted.toSeq
      val off = withRuleOff(
        df.filter(cond).select(col("raw")).collect().map(_.getLong(0)).sorted.toSeq)
      assert(on == off, s"cond #$i: on=$on off=$off")
    }
  }

  test("boundary exactness: >= keeps the first in-range micro, < drops the boundary") {
    // the derived nano bounds must not clip micro-boundary rows: compare
    // counts for adjacent predicates around an exact event timestamp.
    // Round-trip as integer micros, not Timestamp.toString (which renders
    // in the JVM default timezone while the cast parses in session UTC).
    val us = nanosEvents
      .select(unix_micros(col("ts")).as("us")).orderBy(col("us")).limit(1)
      .collect().head.getLong(0)
    val exact = timestamp_micros(lit(us))
    assert(rows(filtered(col("ts") >= exact)).size ==
      rows(filtered(col("ts") > exact)).size + rows(filtered(col("ts") === exact)).size)
    assert(rows(filtered(col("ts") === exact)).nonEmpty)
  }
}
