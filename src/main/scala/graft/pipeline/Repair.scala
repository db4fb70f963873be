package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dashboard's frame-repair pass (SURVEY.md §2.3 P9–P10, §2.4 F4/F7;
  * `dashboard/streamlit_app.py:183–252`) as one declarative function.
  *
  * The reference re-repairs schemaless JSON on every refresh: per-column
  * fillna defaults (DSA:202–220), numeric coercion with errors='coerce'
  * (DSA:243–246), hashtag list normalization incl. an `eval` on stringified
  * lists (DSA:223–240), and a 3-candidate timestamp coalesce (DSA:190–196).
  * Our engine writes schema-stable output so repair is usually a no-op —
  * but the operator exists for reading foreign/degraded data, and its
  * semantics are pinned here.
  */
object Repair {

  /** Per-column defaults exactly as DSA:202–220. */
  val stringDefaults: Map[String, String] = Map(
    "sentiment_label" -> "neutral",
    "platform" -> "unknown",
    "user" -> "anonymous",
    "country" -> "Unknown",
    "city" -> "Unknown",
    "text" -> "",
    "cleaned_text" -> "")

  val numericDefaults: Map[String, Double] = Map(
    "likes" -> 0d, "retweets" -> 0d, "user_followers" -> 0d,
    "sentiment_score" -> 0d)

  def repair(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    var out = df
    // P9: string defaults (only for columns present, like the dashboard's
    // `if col in df.columns` guards)
    out = out.na.fill(stringDefaults.filter(kv => cols(kv._1)))
    // P10: numeric coercion — cast-or-default (errors='coerce' + fillna 0)
    numericDefaults.foreach { case (c, d) =>
      if (cols(c))
        out = out.withColumn(c, coalesce(col(c).cast("double"), lit(d)))
    }
    // F7: hashtag normalization — null → empty array
    if (cols("hashtags"))
      out = out.withColumn("hashtags",
        coalesce(col("hashtags"), array().cast("array<string>")))
    out
  }
}
