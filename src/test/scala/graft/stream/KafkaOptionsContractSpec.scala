package graft.stream

import graft.SparkSpec
import graft.pipeline.{Enrich, KafkaSource, RatePostSource, Sinks}
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap

/** The Kafka source/sink branches are options-only construction (no
  * connector jar offline — SURVEY §7.0), which means a typo'd option KEY
  * would compile, pass every other test, and only fail on the production
  * cluster.  This spec pins the exact option-name set and values against
  * the reference's contract (`consumer/spark_streaming_job.py:110–118`
  * source, `producer/kafka_producer.py:82–90` sink) by reflecting the
  * configured `DataStreamReader`/`DataStreamWriter` internal options map
  * — fully offline, independent of the jar, because nothing is load()ed
  * or start()ed.
  *
  * SPARK-VERSION COUPLING: `extraOptions` is a private internal of
  * Spark's DataStreamReader/Writer (4.1.x).  If a Spark upgrade renames
  * it, `field()` below fails with "no field extraOptions ..." — that is
  * HARNESS breakage, not option drift: re-point the reflection at the
  * renamed internal rather than suspecting the Kafka option contract. */
class KafkaOptionsContractSpec extends SparkSpec {

  /** Reads a private field off the runtime (classic) class hierarchy. */
  private def field[T](obj: AnyRef, name: String): T = {
    var k: Class[_] = obj.getClass
    while (k != null && !k.getDeclaredFields.exists(_.getName == name))
      k = k.getSuperclass
    require(k != null, s"no field $name on ${obj.getClass}")
    val f = k.getDeclaredField(name)
    f.setAccessible(true)
    f.get(obj).asInstanceOf[T]
  }

  private def options(obj: AnyRef): Map[String, String] =
    field[CaseInsensitiveMap[String]](obj, "extraOptions").originalMap

  test("KafkaSource reader carries exactly the reference's option set") {
    val src = KafkaSource(bootstrapServers = "broker1:9092,broker2:9092")
    val r = src.reader(spark)
    assert(field[String](r, "source") == "kafka")
    val opts = options(r)
    assert(opts.keySet == Set(
      "kafka.bootstrap.servers", "subscribe", "startingOffsets",
      "failOnDataLoss", "maxOffsetsPerTrigger"),
      s"option-name drift: ${opts.keySet}")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "social-media-posts") // CSJ:113 topic
    assert(opts("startingOffsets") == "latest")       // CSJ:115
    assert(opts("failOnDataLoss") == "false")         // CSJ:116
    assert(opts("maxOffsetsPerTrigger") == "100")     // CSJ:117 (T4 cap)
  }

  test("KafkaSource non-default knobs land in the same keys") {
    val src = KafkaSource("b:9092", topic = "other", startingOffsets = "earliest",
      failOnDataLoss = true, maxOffsetsPerTrigger = 5000L)
    val opts = options(src.reader(spark))
    assert(opts("subscribe") == "other")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("failOnDataLoss") == "true")
    assert(opts("maxOffsetsPerTrigger") == "5000")
  }

  test("Kafka sink writer carries exactly the producer's option set") {
    val enriched = Enrich.enrich(RatePostSource(1).load(spark))
    val w = Sinks.kafka(enriched, "b:9092", "sentiment-out", "/tmp/cp-contract")
    assert(field[String](w, "source") == "kafka")
    val opts = options(w)
    // queryName is Spark's own: .queryName(...) round-trips through the
    // writer's options map, so it legitimately appears alongside ours
    assert(opts.keySet == Set(
      "kafka.bootstrap.servers", "topic", "checkpointLocation", "queryName"),
      s"option-name drift: ${opts.keySet}")
    assert(opts("queryName") == "kafka_output")
    assert(opts("kafka.bootstrap.servers") == "b:9092")
    assert(opts("topic") == "sentiment-out")
    assert(opts("checkpointLocation") == "/tmp/cp-contract")
  }
}
