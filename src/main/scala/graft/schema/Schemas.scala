package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the social-media pipeline (SURVEY.md §1.2).
  *
  * The input schema mirrors the reference's explicit StructType
  * (`consumer/spark_streaming_job.py:92–106`): the consumer declares rather
  * than infers, so malformed records null out instead of corrupting the
  * stream. Event time arrives as a plain string in `yyyy-MM-dd HH:mm:ss`
  * (stamped by `producer/kafka_producer.py:77`); the engine preserves that
  * column for parity and adds a proper timestamp cast where windows need it.
  */
object Schemas {

  val locationSchema: StructType = StructType(Seq(
    StructField("city", StringType, nullable = true),
    StructField("country", StringType, nullable = true)))

  /** Reference input schema (CSJ:97–106). */
  val postSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("platform", StringType, nullable = true),
    StructField("user_followers", IntegerType, nullable = true),
    StructField("likes", IntegerType, nullable = true),
    StructField("retweets", IntegerType, nullable = true),
    StructField("location", locationSchema, nullable = true),
    StructField("timestamp", StringType, nullable = true)))

  /** Enriched output schema (CSJ:128–136 result; FIXTURES.md §1). */
  val enrichedSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("user", StringType, nullable = true),
    StructField("platform", StringType, nullable = true),
    StructField("user_followers", IntegerType, nullable = true),
    StructField("likes", IntegerType, nullable = true),
    StructField("retweets", IntegerType, nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("processing_timestamp", TimestampType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("cleaned_text", StringType, nullable = true),
    StructField("sentiment_score", FloatType, nullable = true),
    StructField("sentiment_label", StringType, nullable = true),
    StructField("hashtags", ArrayType(StringType), nullable = true)))
}

/** Typed edge of the pipeline (Dataset[Post] where type safety helps). */
case class Location(city: Option[String], country: Option[String])

case class Post(
    text: Option[String],
    user: Option[String],
    platform: Option[String],
    user_followers: Option[Int],
    likes: Option[Int],
    retweets: Option[Int],
    location: Option[Location],
    timestamp: Option[String])
