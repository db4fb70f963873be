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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
    * TimestampType with integral DIV (no double round-trip — 1.7e18 ns doesn't
    * fit a double's 53-bit mantissa). DuckDB oracles use CAST(ts AS TIMESTAMP)
    * for the same floor-to-micros semantics. Note: ts filters won't push down
    * to parquet through the conversion; event-time queries here group rather
    * than filter, and at scale the table would be date-partitioned anyway. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
