package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark DataFrame program plus (where SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Contract requirements (see SparkEntry):
  *  - column names must match between `fn`'s result and `oracle` (driver sorts
  *    columns by name before hashing values);
  *  - results must be deterministically ordered (explicit tie-breakers);
  *  - floating-point aggregates are rounded identically on both sides.
  */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
