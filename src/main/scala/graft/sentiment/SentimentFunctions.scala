package graft.sentiment

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level sentiment API (SURVEY.md §2.5).
  *
  * U1 (`sentiment_udf`, reference `consumer/spark_streaming_job.py:15–25, 39`)
  * becomes a JVM-local Scala UDF over [[Vader.compound]] — codegen-opaque but
  * with no serialization boundary (the reference pays a Python pickle
  * round-trip per row).  Null/blank → 0.0f exactly as CSJ:19–20.
  *
  * U2 (`sentiment_label_udf`, CSJ:27–36) needs no UDF at all: it is a pure
  * CASE WHEN that stays inside whole-stage codegen.  A null score falls
  * through to the `otherwise` branch → "neutral", matching CSJ:29–30.
  */
object SentimentFunctions {

  /** Tier-1: VADER compound score as a Scala UDF (FloatType, like the
    * reference's registration, CSJ:39). JVM-local — already deletes the
    * reference's Python boundary — but codegen-opaque. */
  val sentimentScoreUdf = udf { text: String =>
    if (text == null) 0.0f else Vader.compound(text).toFloat
  }

  /** Tier-2 (default): the native [[VaderCompound]] expression via the
    * registered SQL function — a direct static call inside whole-stage
    * codegen, no encoder boundary. Requires [[GraftFunctions.register]],
    * which [[graft.pipeline.Enrich.enrich]] performs per session. */
  def sentimentScoreNative(text: Column): Column =
    call_function("vader_compound", text)

  def sentimentScore(text: Column): Column = sentimentScoreNative(text)

  /** Threshold labeling: ≥0.05 positive, ≤−0.05 negative, else neutral. */
  def sentimentLabel(score: Column): Column =
    when(score >= 0.05f, "positive")
      .when(score <= -0.05f, "negative")
      .otherwise("neutral")
}
