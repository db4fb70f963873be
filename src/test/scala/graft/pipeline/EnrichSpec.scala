package graft.pipeline

import graft.SparkSpec
import graft.schema.Schemas
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end tests of the enrichment chain (SURVEY.md §2.3–2.5) over the
  * fixture corpus of FIXTURES.md §1: null/empty text, hashtag multiplicity +
  * case folding, label thresholds, missing location/numerics. */
class EnrichSpec extends SparkSpec {

  private def corpus: Seq[String] = Seq(
    """{"text": "I love this new product! #Amazing #happy", "user": "user123", "platform": "twitter", "user_followers": 1500, "likes": 25, "retweets": 5, "location": {"city": "New York", "country": "USA"}, "timestamp": "2024-01-01 12:00:00"}""",
    """{"text": "this is terrible, i hate it", "user": "user456", "platform": "facebook", "user_followers": 10, "likes": 0, "retweets": 0, "location": {"city": "Paris", "country": "France"}, "timestamp": "2024-01-01 12:00:05"}""",
    """{"text": "the table has rows", "user": "user789", "platform": "twitter", "likes": 3, "timestamp": "2024-01-01 12:00:10"}""",
    """{"text": null, "user": "nulltext", "platform": "twitter", "timestamp": "2024-01-01 12:00:15"}""",
    """{"text": "", "user": "emptytext", "platform": "twitter", "timestamp": "2024-01-01 12:00:20"}""",
    """{"text": "#ONE #one #TWO no hash tag here", "user": "tags", "platform": "x", "timestamp": "2024-01-01 12:00:25"}""")

  private lazy val enriched = {
    val dir = Files.createTempDirectory("graft-corpus").toFile
    val f = new java.io.File(dir, "posts.json")
    Files.write(f.toPath, corpus.mkString("\n").getBytes)
    Enrich.enrich(spark.read.schema(Schemas.postSchema).json(dir.getAbsolutePath)).cache()
  }

  test("null/empty text rows are filtered (P5)") {
    assert(enriched.count() == 4)
    assert(enriched.filter(col("user").isin("nulltext", "emptytext")).count() == 0)
  }

  test("struct promotion + drop (P6/P7)") {
    assert(!enriched.columns.contains("location"))
    val r = enriched.filter(col("user") === "user123")
      .select("city", "country").head()
    assert(r == Row("New York", "USA"))
    // missing location → null city/country
    val m = enriched.filter(col("user") === "user789").select("city").head()
    assert(m.isNullAt(0))
  }

  test("cleaned_text lowercases (F1) and hashtags extract from it (F2)") {
    val r = enriched.filter(col("user") === "tags")
      .select("cleaned_text", "hashtags").head()
    assert(r.getString(0) == "#one #one #two no hash tag here")
    assert(r.getSeq[String](1) == Seq("one", "one", "two"))
    val none = enriched.filter(col("user") === "user789").select("hashtags").head()
    assert(none.getSeq[String](0).isEmpty)
  }

  test("sentiment score + label thresholds (U1/U2)") {
    val rows = enriched.select("user", "sentiment_score", "sentiment_label")
      .collect().map(r => r.getString(0) -> ((r.getFloat(1), r.getString(2)))).toMap
    assert(rows("user123")._1 > 0.05f && rows("user123")._2 == "positive")
    assert(rows("user456")._1 < -0.05f && rows("user456")._2 == "negative")
    assert(rows("user789")._1 == 0.0f && rows("user789")._2 == "neutral")
  }

  test("enriched schema matches the declared output schema (FIXTURES.md §1)") {
    val got = enriched.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    Schemas.enrichedSchema.fields.foreach { f =>
      assert(got.get(f.name).contains(f.dataType.typeName),
        s"column ${f.name}: expected ${f.dataType.typeName}, got ${got.get(f.name)}")
    }
  }

  test("kafka-shaped decode (P1–P3) round-trips the declared schema") {
    import spark.implicits._
    val kafkaShaped = corpus.toDF("value")
    val out = Enrich.fromKafkaValue(kafkaShaped)
    assert(out.count() == 4)
    assert(out.filter(col("user") === "user123").select("likes").head().getInt(0) == 25)
  }

  test("malformed and schema-drifted JSON never kills the pipeline (robustness)") {
    import spark.implicits._
    // a production stream carries garbage: truncated JSON, wrong types,
    // missing fields, empty strings.  from_json is PERMISSIVE — bad rows
    // become null structs / null fields, and the null-text filter (P5)
    // drops them without failing the batch.
    val dirty = Seq(
      """{"text": "a valid post", "user": "ok", "platform": "twitter", "timestamp": "2024-01-01 12:00:00"}""",
      """{"text": "truncated""",                                    // broken JSON
      """not json at all""",
      """{"text": 42, "user": "wrongtype"}""",                      // type drift
      """{"user": "notext"}""",                                     // missing text
      """{"text": "", "user": "empty"}""",                          // empty text
      """{}""").toDF("value")
    val out = Enrich.fromKafkaValue(dirty)
    // survivors: the well-formed row, plus the type-drifted one — the
    // PERMISSIVE parser stringifies scalar drift ("text": 42 → "42")
    // rather than nulling the row, which is the lenient behavior a lossy
    // social firehose wants.  Everything unparseable/empty is dropped.
    val users = out.select("user").collect().map(_.getString(0)).toSet
    assert(users == Set("ok", "wrongtype"), s"unexpected survivors: $users")
  }

  test("native vader_compound expression ≡ tier-1 UDF on all fixture texts") {
    import graft.sentiment.{GraftFunctions, SentimentFunctions}
    GraftFunctions.register(spark)
    val both = enriched.select(
      col("user"),
      SentimentFunctions.sentimentScoreNative(col("cleaned_text")).as("native"),
      SentimentFunctions.sentimentScoreUdf(col("cleaned_text")).as("viaUdf"))
    both.collect().foreach { r =>
      assert(r.getFloat(1) == r.getFloat(2), s"divergence for user ${r.getString(0)}")
    }
    // null input: expression returns 0.0f (reference CSJ:19–20 semantics)
    val nullScore = spark.sql("SELECT vader_compound(CAST(NULL AS STRING))").head().getFloat(0)
    assert(nullScore == 0.0f)
  }

  test("event-time derivation falls back to processing time (F4)") {
    val ts = Enrich.withEventTime(enriched)
      .filter(col("user") === "user123").select("event_ts").head().getTimestamp(0)
    assert(ts.toInstant.toString == "2024-01-01T12:00:00Z")
  }
}
