package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Unit behavior of the live near-dup candidate detector: collisions
  * emit normalized pairs exactly once, short/disjoint texts never pair,
  * re-delivery is idempotent, cross-batch arrivals pair against history,
  * and a runaway bucket fails loudly.  Replay ≡ d3's batch candidate
  * relation is pinned separately in [[LiveNearDupParitySpec]]. */
class LiveNearDupSpec extends SparkSpec {

  private def doc(id: Long, text: String) = LiveNearDup.DocEvent(id, text)

  // two near-identical texts (share almost all trigram shingles — the
  // planted collision), one unrelated, one too short to shingle
  private val a = "the quick brown fox jumps over the lazy dog tonight"
  private val b = "the quick brown fox jumps over the lazy dog today"
  private val other = "completely different words about completely other topics entirely here"

  test("colliding docs emit one normalized pair per shared band; disjoint/short docs never pair") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LiveNearDup.DocEvent]
    val q = LiveNearDup.candidates(input.toDS())
      .writeStream.format("memory").queryName("lnd_unit")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(2, a), doc(1, b), doc(3, other), doc(4, "too short"))
      q.processAllAvailable()
      val got = spark.table("lnd_unit").as[LiveNearDup.Candidate].collect()
      assert(got.nonEmpty, "planted near-identical docs did not collide in any band")
      assert(got.forall(c => c.doc_a == 1L && c.doc_b == 2L),
        s"unexpected pairs: ${got.toSeq}")
      assert(got.map(_.band).distinct.length == got.length,
        s"same band emitted a pair twice: ${got.toSeq}")
      // re-delivery (checkpoint replay shape): nothing new is emitted
      input.addData(doc(2, a), doc(1, b))
      q.processAllAvailable()
      assert(spark.table("lnd_unit").count() == got.length.toLong,
        "re-delivered docs re-emitted their pairs")
      // a later third copy pairs against BOTH history members
      input.addData(doc(9, a))
      q.processAllAvailable()
      val after = spark.table("lnd_unit").as[LiveNearDup.Candidate].collect()
      val newPairs = after.map(c => (c.doc_a, c.doc_b)).distinct.toSet
      assert(newPairs.contains((1L, 9L)) && newPairs.contains((2L, 9L)),
        s"cross-batch arrival missed history: $newPairs")
    } finally q.stop()
  }

  test("bucket membership survives a checkpointed restart (third copy pairs with history)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dirs = restartDirs("lnd")
    import dirs.{cp, in, out}
    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit =
      dirs.writeBatch(name,
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" })
    def start() = LiveNearDup.candidates(
      spark.readStream.schema("doc_id BIGINT, text STRING").json(in)
        .as[LiveNearDup.DocEvent])
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()

    // run 1: the colliding pair lands in STATE, then STOP
    val q1 = start()
    try {
      writeDocs("b0.json", Seq(1L -> b, 2L -> a))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: a third copy arrives — it must pair against BOTH historical
    // members (bucket membership crossed the stop inside the state
    // store; a loss would pair it with nothing)
    val q2 = start()
    try {
      writeDocs("b1.json", Seq(9L -> a))
      q2.processAllAvailable()
    } finally q2.stop()

    val pairs = spark.read
      .schema("doc_a BIGINT, doc_b BIGINT, band INT, bv BIGINT")
      .json(out).as[LiveNearDup.Candidate].collect()
      .map(c => (c.doc_a, c.doc_b)).distinct.toSet
    assert(pairs.contains((1L, 2L)), s"pre-restart pair missing: $pairs")
    assert(pairs.contains((1L, 9L)) && pairs.contains((2L, 9L)),
      s"post-restart arrival did not pair with pre-restart members: $pairs")
  }

  test("verified stage: colliding near-identical docs emit jaccard>=0.5 pairs; disjoint docs never do") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[LiveNearDup.DocEvent]
    val q = LiveNearDup.verifiedPairs(input.toDS())
      .writeStream.format("memory").queryName("lnd_vunit")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc(2, a), doc(1, b), doc(3, other), doc(4, "too short"))
      q.processAllAvailable()
      val got = spark.table("lnd_vunit").as[LiveNearDup.VerifiedPair].collect()
      assert(got.nonEmpty, "planted near-identical docs did not verify in any band")
      assert(got.forall(p => p.doc_a == 1L && p.doc_b == 2L), s"unexpected: ${got.toSeq}")
      // closed-form jaccard of the fixture: 10-token texts → 8 distinct
      // trigram shingles each, differing only in the final token → 7
      // shared → 7/9 = 0.7778 at round-4
      assert(got.forall(_.jaccard == 0.7778), s"jaccard off: ${got.toSeq}")
      // re-delivery is idempotent
      input.addData(doc(2, a), doc(1, b))
      q.processAllAvailable()
      assert(spark.table("lnd_vunit").count() == got.length.toLong,
        "re-delivered docs re-emitted their verified pairs")
    } finally q.stop()
  }

  test("verified-stage shingle state survives a checkpointed restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val dirs = restartDirs("lndv")
    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit =
      dirs.writeBatch(name,
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" })
    def start() = LiveNearDup.verifiedPairs(
      spark.readStream.schema("doc_id BIGINT, text STRING").json(dirs.in)
        .as[LiveNearDup.DocEvent])
      .writeStream.format("json")
      .option("path", dirs.out).option("checkpointLocation", dirs.cp)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()

    val q1 = start()
    try {
      writeDocs("b0.json", Seq(1L -> b, 2L -> a))
      q1.processAllAvailable()
    } finally q1.stop()

    // the third copy must VERIFY (not just collide) against both
    // historical members — their shingle sets crossed the stop in state
    val q2 = start()
    try {
      writeDocs("b1.json", Seq(9L -> a))
      q2.processAllAvailable()
    } finally q2.stop()

    val pairs = spark.read
      .schema("doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE, band INT, bv BIGINT")
      .json(dirs.out).as[LiveNearDup.VerifiedPair].collect()
    val keys = pairs.map(p => (p.doc_a, p.doc_b)).distinct.toSet
    assert(keys.contains((1L, 2L)), s"pre-restart pair missing: $keys")
    assert(keys.contains((1L, 9L)) && keys.contains((2L, 9L)),
      s"post-restart arrival did not verify against pre-restart members: $keys")
    // doc 9 IS doc 2's text — identical shingle sets → jaccard 1.0
    assert(pairs.filter(p => (p.doc_a, p.doc_b) == ((2L, 9L))).forall(_.jaccard == 1.0),
      s"identical docs should verify at jaccard 1.0: ${pairs.toSeq}")
  }

  test("a runaway bucket fails loudly at maxBucket instead of silently growing (both stages)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    for ((name, ds) <- Seq[(String, org.apache.spark.sql.Dataset[_])](
        "cand" -> { val in = MemoryStream[LiveNearDup.DocEvent]
          in.addData((1L to 4L).map(i => doc(i, a)): _*)
          LiveNearDup.candidates(in.toDS(), maxBucket = 3) },
        "verified" -> { val in = MemoryStream[LiveNearDup.DocEvent]
          in.addData((1L to 4L).map(i => doc(i, a)): _*)
          LiveNearDup.verifiedPairs(in.toDS(), maxBucket = 3) })) {
      val q = ds.writeStream.format("memory").queryName(s"lnd_cap_$name")
        .outputMode(OutputMode.Append).start()
      try {
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(messages(e).exists(_.contains("exceeded 3 members")),
          s"$name: expected the loud bucket-cap error, got: ${messages(e)}")
      } finally q.stop()
    }
  }
}
