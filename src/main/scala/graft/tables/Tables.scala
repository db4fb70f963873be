package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata star schema (TESTDATA.md / FIXTURES.md §2).
  *
  * Loading convention is the driver contract: one parquet file per table under
  * the sf directory passed to each query. Parquet + the vectorized reader give
  * column pruning and predicate pushdown for free — every query should show
  * `PushedFilters`/`ReadSchema` reaching these scans in `.explain("formatted")`.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.ts has shipped in two physical parquet forms; both load to ONE
    * logical schema — `ts: TimestampType` (microsecond precision, session-UTC):
    *
    *  - TIMESTAMP(MICROS) (current driver testdata): read natively.
    *    `inferTimestampNTZ=false` keeps the isAdjustedToUTC=false annotation
    *    on the LTZ TimestampType (session tz is UTC, so values are identical),
    *    which lets event-time range filters push straight to the parquet scan
    *    as ordinary timestamp bounds — no conversion in the plan at all.
    *  - TIMESTAMP(NANOS) (earlier testdata; real nanos sources): Spark's
    *    vectorized reader rejects it ([PARQUET_TYPE_ILLEGAL]), so read nanos
    *    as a raw long (spark.sql.legacy.parquet.nanosAsLong) and floor to
    *    micros with integral DIV (no double round-trip — 1.7e18 ns doesn't
    *    fit a double's 53-bit mantissa). Filters through this conversion
    *    can't push down on their own; [[graft.plans.NanosFilterPushdown]]
    *    re-derives them as raw-nanos scan bounds.
    *
    * DuckDB oracles use CAST(ts AS TIMESTAMP) — the same floor-to-micros
    * values either way. */
  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  private val NtzKey   = "spark.sql.parquet.inferTimestampNTZ.enabled"

  def events(spark: SparkSession, dir: String): DataFrame = {
    // Both confs are consulted at SCHEMA INFERENCE, which `load` performs
    // eagerly — so they are set only around the load and restored after
    // (per-read options are NOT honored for these keys; verified
    // empirically).  The NTZ-inference toggle is restored unconditionally:
    // leaving it off would silently retype NTZ-annotated timestamp columns
    // of every LATER parquet read in the session.  nanosAsLong stays set
    // only on the nanos branch, where the scan's execution-time footer
    // conversion still needs it — documented stickiness instead of a
    // broken read (EventsConfScopingSpec pins restore + micros execution
    // after restore).
    val saved = Seq(NanosKey, NtzKey).map(k => k -> spark.conf.getOption(k))
    spark.conf.set(NanosKey, "true")
    spark.conf.set(NtzKey, "false")
    def restore(keys: Set[String]): Unit = saved.foreach {
      case (k, prev) if keys(k) => prev match {
        case Some(v) => spark.conf.set(k, v)
        case None    => spark.conf.unset(k)
      }
      case _ =>
    }
    val raw =
      try load(spark, dir, "events")
      catch { case e: Throwable => restore(Set(NanosKey, NtzKey)); throw e }
    restore(Set(NtzKey))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        restore(Set(NanosKey))
        raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
