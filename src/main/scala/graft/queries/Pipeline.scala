package graft.queries

import graft.NamedQuery
import graft.pipeline.Enrich
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The reference's enrichment pipeline (SURVEY.md §2.3–2.5) exposed through
  * the driver gate, batch-run over the `documents` table mapped onto the
  * post schema (text → text, source → user, lang → platform).
  *
  * VADER is not expressible in DuckDB SQL, so the full enrichment query is a
  * rows-only check (contract allows omission, SparkEntry.scala); the
  * SQL-expressible pieces — lowercasing, regex extraction, label thresholds —
  * are oracle-checked separately (p2 here, q12 in Relational; golden unit
  * tests in VaderSpec/EnrichSpec define the sentiment truth). */
object Pipeline {

  /** Full enrichment chain U1/U2 included — rows-only gate. Aggregated to a
    * stable per-label/lang summary so output is small and deterministic. */
  val p1EnrichDocuments = NamedQuery(
    "p1_enrich_documents",
    (s, dir) => {
      val posts = Tables.documents(s, dir).select(
        col("text"),
        col("source").as("user"),
        col("lang").as("platform"),
        lit(null).cast("int").as("user_followers"),
        lit(null).cast("int").as("likes"),
        lit(null).cast("int").as("retweets"),
        struct(lit(null).cast("string").as("city"),
               lit(null).cast("string").as("country")).as("location"),
        lit(null).cast("string").as("timestamp"))
      Enrich.enrich(posts)
        .groupBy(col("platform"), col("sentiment_label"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("sentiment_score")), 4).as("avg_score"))
        .orderBy(col("platform"), col("sentiment_label"))
    },
    None,
    doc = "full enrichment (P4–P7, F1–F2, U1–U2) batch-run; rows-only (VADER not in DuckDB)")

  /** The SQL-expressible slice of the chain: filter + lower + regex token
    * extraction (F1/F2 shape) — oracle-checked. Pattern pulls words starting
    * with 's' since the corpus has no '#' hashtags; same RegExpExtractAll
    * operator as CSJ:136. */
  val p2CleanExtract = NamedQuery(
    "p2_clean_extract",
    (s, dir) => {
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && col("text") =!= "")
        .withColumn("cleaned_text", lower(col("text")))
        .withColumn("stoken", explode(regexp_extract_all(col("cleaned_text"), lit("\\b(s\\w+)\\b"), lit(1))))
        .groupBy(col("stoken"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("stoken"))
    },
    Some("""SELECT stoken, count(*) AS n
      FROM (SELECT unnest(regexp_extract_all(lower(text), '\b(s\w+)\b', 1)) AS stoken
            FROM documents WHERE text IS NOT NULL AND text <> '') t
      GROUP BY stoken ORDER BY n DESC, stoken"""),
    doc = "F1+F2 parity (lower + regexp_extract_all + explode), oracle-checked")

  def all: Seq[NamedQuery] = Seq(p1EnrichDocuments, p2CleanExtract)
}
