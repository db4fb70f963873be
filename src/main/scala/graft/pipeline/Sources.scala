package graft.pipeline

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable streaming sources (SURVEY.md §2.1 S1–S3).
  *
  * The reference hardwires one Kafka source (`consumer/spark_streaming_job
  * .py:110–118`).  Locally there is no kafka connector jar (offline env,
  * SURVEY §7.0), so the engine abstracts the source: Kafka remains a
  * config-selected option (string-typed `format("kafka")`, resolved at
  * runtime on a cluster that ships the connector), while file/rate/memory
  * sources are the executable reality for tests and local runs.
  */
sealed trait PostSource {
  /** A streaming DataFrame with the post schema (Schemas.postSchema). */
  def load(spark: SparkSession): DataFrame
}

/** S3: JSON-lines directory scan as a stream; the schema is declared, not
  * inferred (PERMISSIVE mode nulls out bad records instead of the
  * dashboard's manual bad-line handling, DSA:127–147). */
final case class FileJsonSource(path: String, maxFilesPerTrigger: Int = 1)
    extends PostSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(Schemas.postSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}

/** S1: Kafka topic subscription — reference options preserved
  * (CSJ:110–118): latest offsets, no fail on data loss, per-trigger ingest
  * cap (T4/T5 backpressure).  Construction is options-only so it compiles
  * without the connector jar; `load` resolves `format("kafka")` at runtime. */
final case class KafkaSource(
    bootstrapServers: String,
    topic: String = "social-media-posts",
    startingOffsets: String = "latest",
    failOnDataLoss: Boolean = false,
    maxOffsetsPerTrigger: Long = 100L)
    extends PostSource {
  /** The fully-configured (un-loaded) reader — exposed so the options
    * CONTRACT is testable offline: KafkaOptionsContractSpec pins the exact
    * option-name set against the reference's
    * `consumer/spark_streaming_job.py:110–118` without needing the
    * connector jar that only `load()` resolves. */
  def reader(spark: SparkSession): org.apache.spark.sql.streaming.DataStreamReader =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger.toString)

  def load(spark: SparkSession): DataFrame =
    Enrich.decodeJson(reader(spark).load()) // P1–P3: value bytes → struct → columns
}

/** T9: deterministic producer replacement — the reference's
  * `kafka_producer.py` emits one random corpus post every 2–8 s; here the
  * rate source drives a seedless, reproducible corpus cycle at a
  * configurable rows/sec. */
final case class RatePostSource(rowsPerSecond: Int = 1) extends PostSource {
  import RatePostSource._
  def load(spark: SparkSession): DataFrame = {
    val rate = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
    val n = corpus.size
    val pick = (col("value") % n).cast("int")
    val texts = array(corpus.map(c => lit(c._1)): _*)
    val users = array(corpus.map(c => lit(c._2)): _*)
    val platforms = array(corpus.map(c => lit(c._3)): _*)
    rate.select(
      element_at(texts, pick + 1).as("text"),
      element_at(users, pick + 1).as("user"),
      element_at(platforms, pick + 1).as("platform"),
      (col("value") % 5000).cast("int").as("user_followers"),
      (col("value") % 100).cast("int").as("likes"),
      (col("value") % 20).cast("int").as("retweets"),
      struct(lit("City").as("city"), lit("Country").as("country")).as("location"),
      date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss").as("timestamp"))
  }
}

object RatePostSource {
  /** (text, user, platform) triples in the spirit of the producer's inline
    * fallback corpus (`producer/kafka_producer.py:50–68`). */
  val corpus: Seq[(String, String, String)] = Seq(
    ("I love this new product! #amazing #happy", "user1", "twitter"),
    ("This is terrible service #disappointed", "user2", "facebook"),
    ("Just okay, nothing special", "user3", "twitter"),
    ("Absolutely fantastic experience! #great", "user4", "instagram"),
    ("Worst purchase ever #angry", "user5", "twitter"))
}
