package graft.pipeline

import graft.schema.Schemas
import graft.sentiment.SentimentFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine core: the reference's streaming enrichment chain
  * (`consumer/spark_streaming_job.py:121–136`, SURVEY.md §2.3–2.5 P1–P7,
  * F1–F2, U1–U2) as one declarative DataFrame→DataFrame function, shared
  * verbatim by batch and streaming (identical logical plan either way —
  * Structured Streaming's incrementalization is orthogonal).
  *
  * Everything except the VADER UDF stays inside whole-stage codegen; with
  * native expressions Catalyst is free to reorder filters around the chain
  * (the reference had to hand-place its filter before the Python UDF because
  * Catalyst won't push predicates past a BatchEvalPython barrier).
  */
object Enrich {

  /** P1+P2+P3: Kafka-style payload decode — binary/string `value` column →
    * declared struct → flattened columns. */
  def decodeJson(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(col(valueCol).cast("string").as("json_string"))
      .select(from_json(col("json_string"), Schemas.postSchema).as("data"))
      .select("data.*")

  /** P4–P7, F1–F2, U1–U2: the enrichment chain over a posts DataFrame. */
  def enrich(posts: DataFrame): DataFrame = {
    graft.sentiment.GraftFunctions.register(posts.sparkSession)
    posts
      .withColumn("processing_timestamp", current_timestamp())
      .filter(col("text").isNotNull && col("text") =!= "")
      .withColumn("city", col("location.city"))
      .withColumn("country", col("location.country"))
      .drop("location")
      .withColumn("cleaned_text", lower(col("text")))
      .withColumn("sentiment_score", SentimentFunctions.sentimentScore(col("cleaned_text")))
      .withColumn("sentiment_label", SentimentFunctions.sentimentLabel(col("sentiment_score")))
      .withColumn("hashtags", hashtags(col("cleaned_text")))
  }

  /** F2: `#(\w+)` capture-group extraction (CSJ:136) — native
    * RegExpExtractAll, no UDF. */
  def hashtags(cleanedText: Column): Column =
    regexp_extract_all(cleanedText, lit("#(\\w+)"), lit(1))

  /** Full pipeline from a raw Kafka-shaped frame (`value` bytes/string). */
  def fromKafkaValue(df: DataFrame): DataFrame = enrich(decodeJson(df))

  /** Event-time column for windowed operations: the producer stamps event
    * time as a string `yyyy-MM-dd HH:mm:ss` (PKP:77); keep the string column
    * for parity and derive a typed timestamp (F4: coalesce of candidates). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_ts",
      coalesce(
        to_timestamp(col("timestamp"), "yyyy-MM-dd HH:mm:ss"),
        col("processing_timestamp")))
}
