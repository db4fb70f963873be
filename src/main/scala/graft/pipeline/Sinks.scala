package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming sinks (SURVEY.md §2.2 K1–K2, §2.9 T1–T6).
  *
  * The reference runs two append-mode queries off one enriched lineage:
  * a console debug sink on a 15 s trigger and a JSON-lines file sink on a
  * 30 s trigger with a checkpoint it wipes at every startup (CSJ:139–161,
  * 42–55).  This engine keeps checkpoints by default — exactly-once across
  * restarts — and makes the reference's fresh-start behavior an explicit
  * flag in JobRunner.  It also restores the windowed aggregation the
  * reference removed (T6 — vestigial `aggregated` dirs, CSJ:59–63).
  */
object Sinks {

  /** K1: console debug sink — append, 5 rows, no truncation, 15 s. */
  def console(enriched: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("15 seconds")): DataStreamWriter[Row] =
    enriched.writeStream
      .outputMode(OutputMode.Append)
      .format("console")
      .option("truncate", "false")
      .option("numRows", 5)
      .trigger(trigger)
      .queryName("console_debug")

  /** K2: JSON-lines file sink — append, checkpointed, 30 s.  (The reference
    * also sets maxFilesPerTrigger here, a source option that is a silent
    * no-op on a sink, CSJ:158 — dropped.) */
  def jsonFiles(enriched: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      queryName: String = "file_output"): DataStreamWriter[Row] =
    enriched.writeStream
      .outputMode(OutputMode.Append)
      .format("json")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .queryName(queryName)

  /** K3: Kafka producer sink — the enriched stream serialized back to JSON
    * (the reference's producer semantics, `kafka_producer.py:14–35`, with
    * at-least-once delivery via the checkpoint instead of per-message sync
    * acks).  Options-only construction: `format("kafka")` resolves at
    * runtime on clusters shipping the connector jar (absent locally —
    * SURVEY §7.0 — so this builder is compile-covered, not test-covered). */
  def kafka(enriched: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): DataStreamWriter[Row] =
    enriched
      .select(to_json(struct(enriched.columns.map(col): _*)).as("value"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .queryName("kafka_output")

  /** foreachBatch escape hatch: per-micro-batch exact dedup before the
    * write — the streaming form of the d1 fingerprint dedup, for sinks
    * that must not receive duplicate documents.  `foreachBatch` gives the
    * batch DataFrame API (joins, dedup, upserts) inside a streaming query;
    * dedup here is within-batch plus against the already-written output via
    * an anti-join on fingerprints. */
  def dedupedJsonFiles(enriched: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): DataStreamWriter[Row] = {
    import org.apache.spark.sql.SaveMode
    enriched.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .queryName("deduped_output")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val spark = batch.sparkSession
        val withFp = batch.withColumn("__fp",
          graft.queries.TextOps.normFingerprint(col("text")))
          .dropDuplicates("__fp")
        val dir = new java.io.File(path)
        val fresh =
          if (dir.exists() && dir.listFiles().exists(f => f.getName.endsWith(".json"))) {
            val seen = spark.read.schema(batch.schema).json(path)
              .select(graft.queries.TextOps.normFingerprint(col("text")).as("__fp"))
              .distinct()
            withFp.join(seen, Seq("__fp"), "left_anti")
          } else withFp
        fresh.drop("__fp").write.mode(SaveMode.Append).json(path)
        ()
      }
  }

  /** Scale-correct streaming dedup: `dropDuplicatesWithinWatermark` keeps
    * per-fingerprint state only until the watermark passes its event time,
    * so state is BOUNDED by the dup horizon — unlike
    * [[dedupedJsonFiles]]'s anti-join, which re-reads the entire written
    * output every micro-batch (fine for a demo sink, quadratic over a
    * long-running 100 TB ingest).  Duplicates arriving within `horizon` of
    * each other emit once; a re-arrival after the watermark passes is a
    * new document by definition of the horizon. */
  def dedupWithinWatermark(enriched: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    Enrich.withEventTime(enriched)
      .withColumn("__fp", graft.queries.TextOps.normFingerprint(col("text")))
      .withWatermark("event_ts", horizon)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** T6: the windowed aggregation the reference deleted, restored properly:
    * tumbling 1-minute sentiment counts on event time with a 2-minute
    * watermark (append mode emits each window once it is final). */
  def windowedSentimentCounts(enriched: DataFrame): DataFrame =
    Enrich.withEventTime(enriched)
      .withWatermark("event_ts", "2 minutes")
      .groupBy(window(col("event_ts"), "1 minute"), col("sentiment_label"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("sentiment_label"), col("n"))
}
