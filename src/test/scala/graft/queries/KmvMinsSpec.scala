package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Kernel properties of `graft_kmv_mins` and the estimator theorem d17
  * rests on — deterministic seeded samples (the VaderSpec property
  * style; no runtime randomness, every failure reproduces).
  */
class KmvMinsSpec extends SparkSpec {

  private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }
  private val P = 1000000007L

  /** Seeded multiset with duplicates, values in [0, P). */
  private def sample(seed: Long, n: Int): Seq[Long] =
    (0 until n).map(i => math.floorMod(mix(seed * 7919 + i / 3), P))

  test("aggregate == k smallest distinct, straddling k, at any partitioning") {
    graft.sentiment.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val k = 8
    for (seed <- 1L to 12L; n <- Seq(3, 8, 9, 40)) {
      val vals = sample(seed, n)
      val want = vals.distinct.sorted.take(k)
      for (parts <- Seq(1, 7)) {
        val got = vals.toDF("h").repartition(parts)
          .agg(call_function("graft_kmv_mins", col("h"), lit(k), lit(P)).as("m"))
          .collect().head.getSeq[Long](0).toSeq
        assert(got == want,
          s"seed=$seed n=$n parts=$parts: got $got want $want")
      }
    }
  }

  test("the multiset theorem: k-mins(A ∪ B) == k smallest of mins(A) ∪ mins(B)") {
    // the identity every d17 pair estimate rests on (Beyer et al. §4),
    // verified over 100 seeded set pairs with engineered overlap
    val k = 16
    for (seed <- 1L to 100L) {
      val a = sample(seed, 60).distinct.toSet
      val b = (sample(seed + 1000, 60).distinct ++ a.take((seed % 20).toInt)).toSet
      val direct = (a ++ b).toVector.sorted.take(k)
      val fromSketches = (a.toVector.sorted.take(k) ++ b.toVector.sorted.take(k))
        .distinct.sorted.take(k)
      assert(direct == fromSketches, s"seed=$seed: theorem violated")
    }
  }

  test("the 3-WAY pooled-mins theorem + membership lemma (d18's foundations)") {
    // d18 rests on two facts Beyer et al. §4 generalizes to k-way:
    //  (1) k-mins(A∪B∪C) = the k smallest of the pooled per-set mins
    //  (2) for any h among them, "h ∈ X" is decidable from mins(X)
    //      alone (fewer than k union elements sit below h, so h is
    //      within X's k smallest whenever it is in X at all)
    // — verified over seeded set triples with engineered pairwise AND
    // triple overlap
    val k = 16
    for (seed <- 1L to 60L) {
      val a = sample(seed, 50).distinct.toSet
      val b = (sample(seed + 500, 50).distinct ++ a.take((seed % 15).toInt)).toSet
      val c = (sample(seed + 900, 50).distinct ++ a.take((seed % 7).toInt) ++
        b.take((seed % 5).toInt)).toSet
      val ka = a.toVector.sorted.take(k)
      val kb = b.toVector.sorted.take(k)
      val kc = c.toVector.sorted.take(k)
      val direct = (a ++ b ++ c).toVector.sorted.take(k)
      val pooled = (ka ++ kb ++ kc).distinct.sorted.take(k)
      assert(direct == pooled, s"seed=$seed: 3-way pooled-mins theorem violated")
      for (h <- pooled) {
        assert(a.contains(h) == ka.contains(h), s"seed=$seed h=$h: A membership")
        assert(b.contains(h) == kb.contains(h), s"seed=$seed h=$h: B membership")
        assert(c.contains(h) == kc.contains(h), s"seed=$seed h=$h: C membership")
      }
    }
  }

  test("live shingle hashing == the batch expression pipeline on gnarly whitespace") {
    graft.sentiment.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val texts = Seq(
      "a b c d e",
      "  leading and   multiple   interior spaces  ",
      "tab\tseparated\ttokens\tcount\ttoo",
      "mixed \t whitespace\n with newlines in it",
      "exactly three words",
      "two words",
      "one",
      "repeat repeat repeat repeat repeat",
      "punct. tokens, count! as? tokens: here;")
    for (t <- texts) {
      // the batch pipeline's exact shape: tokens → size ≥ 3 guard →
      // shingleArrayOf → explode → charfold (the shingles() builder
      // applied to one in-memory text)
      val batch = Seq(t).toDF("text")
        .withColumn("w", TextOps.tokens(col("text")))
        .filter(size(col("w")) >= 3)
        .select(explode(TextOps.shingleArrayOf(col("w"))).as("sh"))
        .select(call_function("graft_charfold", col("sh")))
        .collect().map(_.getLong(0)).toSet
      val live = graft.stream.LiveOverlapSketch.shingleHashes(t).toSet
      assert(live == batch, s"text '$t': live $live != batch $batch")
    }
  }

  test("bad argument TYPES fail at analysis time, not executor time") {
    // round-12 ADVICE: an un-type-checked m surfaced as an executor-time
    // IllegalArgumentException; now (bigint, int, int|bigint) is enforced
    // by checkInputDataTypes, so a bad m is an AnalysisException
    graft.sentiment.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L).toDF("h")
    // bigint m literal is ACCEPTED (the message used to claim int-only)
    val ok = df.agg(call_function("graft_kmv_mins",
      col("h"), lit(4), lit(P)).as("m")).collect().head.getSeq[Long](0)
    assert(ok == Seq(1L, 2L))
    for (badM <- Seq(lit("7"), lit(1.5))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(call_function("graft_kmv_mins", col("h"), lit(4), badM)).collect()
      }
      assert(e.getMessage.contains("graft_kmv_mins"), e.getMessage)
    }
    // and a bad child type is likewise analysis-time
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("h")
        .agg(call_function("graft_kmv_mins", col("h"), lit(4), lit(P))).collect()
    }
    assert(e2.getMessage.contains("graft_kmv_mins"), e2.getMessage)
  }

  test("out-of-range CONSTANTS fail at analysis time too (r13 ADVICE)") {
    // k/m are foldable, so their VALUES are analysis-time facts: k=1 or
    // m=0 used to ride through the type check and throw the lazy-val
    // IllegalArgumentException in offer() on an executor
    graft.sentiment.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L).toDF("h")
    for ((k, m) <- Seq((lit(1), lit(P)), (lit(0), lit(P)),
      (lit(4), lit(0)), (lit(4), lit(-5L)))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.agg(call_function("graft_kmv_mins", col("h"), k, m)).collect()
      }
      assert(e.getMessage.contains("graft_kmv_mins"), e.getMessage)
    }
  }
}
