package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** c10's contract is that a PROBABILISTIC structure (the in-plan bloom
  * pre-filter) sits inside an EXACT query: the result must be bit-identical
  * to the plain anti-join at any bloom sizing, because a bloom has no false
  * negatives and the candidate tail is re-checked exactly.  These tests pin
  * both halves of that argument, plus non-vacuity (the benchmark slice
  * actually drops documents — a decon query that never drops anything
  * proves nothing). */
class BloomDeconSpec extends SparkSpec {

  private def corpus = Tables.documents(spark, sf())
    .filter(col("text").isNotNull && col("text") =!= "")
    .withColumn("fp", TextOps.normFingerprint(col("text")))

  private def bench = corpus.filter(col("doc_id") % 13 === 0)
    .select(col("fp")).distinct()

  test("c10 equals the exact anti-join recount, and drops documents") {
    val got = Curation.c10BloomDecontamination.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    val docs = corpus.cache()
    val kept = docs.join(bench, Seq("fp"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    val expect = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(kept, Seq("source"), "left")
      .collect()
      .map { r =>
        val nd = r.getLong(1)
        val nk = if (r.isNullAt(2)) 0L else r.getLong(2)
        (r.getString(0), nd, nk, nd - nk)
      }
      .toSeq.sortBy(_._1)
    docs.unpersist()

    assert(got == expect, s"c10 diverged from exact recount:\n$got\nvs\n$expect")
    assert(got.map(_._4).sum > 0, "benchmark slice dropped nothing — vacuous")
    assert(got.map(_._3).sum > 0, "everything dropped — fixture degenerate")
  }

  test("the bloom pre-filter clears only definitely-clean rows (no false negatives)") {
    graft.sentiment.GraftFunctions.register(spark)
    val bloom = bench
      .agg(call_function("graft_bloom_agg", xxhash64(col("fp")),
        lit(1L << 16), lit(1L << 22)).as("bf"))
      .scalar()
    val might = call_function("graft_bloom_might", bloom, xxhash64(col("fp")))
    // every row the bloom clears must be absent from the benchmark set:
    // cleared ∩ bench == ∅ is exactly the no-false-negative invariant that
    // licenses skipping the exact check for the cleared majority
    val leaked = corpus.filter(!might)
      .join(bench, Seq("fp"), "left_semi").count()
    assert(leaked == 0L, s"$leaked benchmark rows slipped past the bloom")
    // and the candidates must cover every true hit
    val hits = corpus.join(bench, Seq("fp"), "left_semi").count()
    val candHits = corpus.filter(might)
      .join(bench, Seq("fp"), "left_semi").count()
    assert(candHits == hits, s"candidates cover $candHits of $hits true hits")
    assert(hits > 0, "no true hits at this sf — invariant tests are vacuous")
  }

  test("an EMPTY benchmark slice keeps every document (NULL-bloom guard)") {
    // Aggregating the bloom over zero rows yields NULL, and
    // might_contain(NULL, x) is NULL — without the coalesce guard BOTH the
    // !might and might branches would drop every row.  The contract is the
    // exact-anti-join semantics: NOT IN over an empty set keeps everything.
    graft.sentiment.GraftFunctions.register(spark)
    val docs = corpus.cache()
    val emptyBench = docs.filter(lit(false)).select(col("fp")).distinct()
    val bloom = emptyBench
      .agg(call_function("graft_bloom_agg", xxhash64(col("fp")),
        lit(1L << 16), lit(1L << 22)).as("bf"))
      .scalar()
    val might = coalesce(
      call_function("graft_bloom_might", bloom, xxhash64(col("fp"))), lit(false))
    val kept = docs.filter(!might)
      .unionByName(docs.filter(might)
        .join(broadcast(emptyBench), Seq("fp"), "left_anti"))
    val (total, keptN) = (docs.count(), kept.count())
    docs.unpersist()
    assert(total > 0, "corpus empty — test vacuous")
    assert(keptN == total,
      s"empty bench must keep all $total docs, kept $keptN — NULL-bloom guard broken")
  }
}
