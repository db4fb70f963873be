package graft.functions

import graft.SparkSpec
import graft.sentiment.GraftFunctions
import org.apache.spark.sql.functions._

/** Direct unit coverage of the native Catalyst kernels: the query-level
  * oracles prove them in situ, these pin the local contracts — HOF
  * equivalence, reference-fold equality, tie/short-input behavior. */
class NativeFunctionsSpec extends SparkSpec {

  test("graft_bigrams ≡ the HOF transform form on well-formed arrays; null and short inputs defined") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      Seq("a", "b", "c", "d"),
      Seq("one", "two"),
      Seq("x", "", "y"),                 // empty-string tokens preserved
      Seq("solo", "pair", "trio")).toDF("w")
    val both = rows.select(
      call_function("graft_bigrams", col("w")).as("native"),
      expr("transform(sequence(1, size(w) - 1), " +
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))").as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
    }
    // null ELEMENT propagates like concat (null bigram), matching the HOF
    val withNull = Seq(Tuple1(Seq("a", null, "c"))).toDF("w")
      .select(call_function("graft_bigrams", col("w")).as("native"))
      .head().getSeq[String](0)
    assert(withNull == Seq(null, null), s"null propagation broke: $withNull")
    // short arrays: no bigrams (the HOF form would build a DESCENDING
    // sequence(1, 0) here — the kernel is defined where the HOF is not)
    val short = Seq(Tuple1(Seq("only")), Tuple1(Seq.empty[String])).toDF("w")
      .select(call_function("graft_bigrams", col("w")).as("native"))
      .collect().map(_.getSeq[String](0))
    assert(short.forall(_.isEmpty))
    // null ARRAY → null result
    val nullArr = spark.sql("SELECT graft_bigrams(CAST(NULL AS ARRAY<STRING>)) AS b")
      .head()
    assert(nullArr.isNullAt(0))
  }

  test("graft_charfold matches an independent Scala fold and is ASCII-byte based") {
    GraftFunctions.register(spark)
    def ref(s: String): Long = {
      var h = 7L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xFF)) % 1000000007L)
      h
    }
    val samples = Seq("", "a", "hello world", "the quick brown fox", "x" * 600)
    import spark.implicits._
    val got = samples.toDF("s")
      .select(call_function("graft_charfold", col("s")).as("h"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == samples.map(ref), "charfold diverged from the reference fold")
  }

  test("graft_topk keeps duplicate values at the boundary (value-deterministic under ties)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val vals = Seq(5.0, 5.0, 5.0, 4.0, 3.0, 5.0).toDF("v")
    val top = vals.agg(call_function("graft_topk", col("v"), lit(3)).as("t"))
      .head().getSeq[Double](0)
    assert(top == Seq(5.0, 5.0, 5.0), s"tie handling broke: $top")
  }

  test("graft_kmv: exact below k, dedups, matches the reference estimator above k, partition-invariant") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val P = 1000000007L
    def kmv(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(call_function("graft_kmv", col("h"), lit(64), lit(P)).as("e"))
        .head().getLong(0)
    // below k the sketch holds every distinct value: exact, and duplicate
    // input rows must not inflate the count
    val small = (0L until 50L).map(i => (i * 937L) % P).toDF("h")
    assert(kmv(small) == 50L)
    assert(kmv(small.union(small)) == 50L)
    // above k: the estimate must equal an independently computed
    // (k−1)·m div h_k over the same hash multiset
    val hashes = (0L until 5000L).map(i => (i * 464054921L + 327776542L) % P)
    val expected = { val s = hashes.distinct.sorted; 63L * P / s(63) }
    val big = hashes.toDF("h")
    assert(kmv(big) == expected)
    // the estimator is a function of the value SET: merge order / partition
    // layout must not change it (pins the map-side combine path)
    assert(kmv(big.repartition(13)) == expected)
    assert(kmv(big.repartition(1)) == expected)
    // and the estimate is in the right ballpark (k=64 ⇒ σ ≈ 12.5%)
    assert(math.abs(expected - 5000.0) / 5000.0 < 0.3, s"estimator off: $expected")
  }
}
