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
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
