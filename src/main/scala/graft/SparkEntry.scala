package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Curation, Dedup, Multimodal, Pipeline, Relational, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are declared in packs under `graft.queries`; each pack entry is a
  * `NamedQuery` carrying both the Spark program and (where SQL-expressible)
  * the DuckDB oracle SQL. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing values) and every query
  * is deterministically ordered with explicit tie-breakers.
  */
object SparkEntry {

  private def packs: Seq[NamedQuery] =
    Relational.all ++ Analytics.all ++ Pipeline.all ++
      TextOps.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      Curation.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: scan → pushed filter → hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
