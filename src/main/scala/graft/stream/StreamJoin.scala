package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins — the attribution/enrichment
  * operator family the reference approximates with per-topic batch
  * aggregation (`reference/consumer/spark_streaming_job.py` keeps one
  * post stream and correlates engagement only after landing), re-expressed
  * as real Structured Streaming joins.
  *
  * The canonical shape is ad/post attribution: an impression stream and an
  * engagement stream, each watermarked, joined on key with an event-time
  * interval constraint (`click_ts` within `[view_ts, view_ts + horizon]`).
  * Spark keeps BOTH sides' state bounded by the watermark + the interval
  * condition — per key, only rows inside the horizon are buffered, so
  * state is O(traffic × horizon), partition-parallel on the join key, and
  * a 1000-executor cluster shards it exactly like any keyed shuffle.
  * Without the time bound a stream-stream join would need unbounded state;
  * Spark rejects that in append mode, which this module treats as a
  * feature: every join here carries the constraint that makes it runnable
  * forever.
  */
object StreamJoin {

  final case class View(user_id: Long, view_id: Long,
      view_ts: java.sql.Timestamp)
  final case class Click(user_id: Long, click_id: Long,
      click_ts: java.sql.Timestamp)

  private def prep(views: Dataset[View], clicks: Dataset[Click],
      delay: String): (DataFrame, DataFrame) = {
    val v = views.toDF()
      .withColumnRenamed("user_id", "view_user")
      .withWatermark("view_ts", delay)
    val c = clicks.toDF()
      .withColumnRenamed("user_id", "click_user")
      .withWatermark("click_ts", delay)
    (v, c)
  }

  private def cond(horizonSec: Long) =
    expr(s"""view_user = click_user
             AND click_ts >= view_ts
             AND click_ts <= view_ts + INTERVAL $horizonSec SECONDS""")

  /** Inner attribution join: every (view, click) pair for the same user
    * where the click lands within `horizonSec` of the view. Both sides
    * watermarked with `delay`; state for a view is dropped once the
    * watermark passes `view_ts + horizon`, state for a click once it
    * passes `click_ts`. */
  def inner(views: Dataset[View], clicks: Dataset[Click],
      horizonSec: Long = 600L, delay: String = "0 seconds"): DataFrame = {
    val (v, c) = prep(views, clicks, delay)
    v.join(c, cond(horizonSec), "inner")
      .select(col("view_user").as("user_id"), col("view_id"),
        col("view_ts"), col("click_id"), col("click_ts"))
  }

  /** Left-outer attribution: views that never receive a click inside the
    * horizon still emit — with null click columns — but only once the
    * watermark proves no matching click can still arrive (watermark past
    * `view_ts + horizon`). This is the "unconverted impressions" feed; the
    * delayed null emission is the defining left-outer stream-stream
    * semantic, asserted in StreamJoinSpec. */
  def leftOuter(views: Dataset[View], clicks: Dataset[Click],
      horizonSec: Long = 600L, delay: String = "0 seconds"): DataFrame = {
    val (v, c) = prep(views, clicks, delay)
    v.join(c, cond(horizonSec), "left_outer")
      .select(col("view_user").as("user_id"), col("view_id"),
        col("view_ts"), col("click_id"), col("click_ts"))
  }

  /** Stream-static enrichment: the streaming side joined to a small batch
    * dimension (user → tier), broadcast to every task each micro-batch.
    * No streaming state at all — the static side is re-resolved per batch,
    * which also means a refreshed dim table is picked up live. The 100 TB
    * shape for "attach dimension attributes to a firehose". */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
      key: String = "user_id"): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
