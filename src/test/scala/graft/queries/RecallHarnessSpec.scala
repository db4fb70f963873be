package graft.queries

import graft.{NamedQuery, SparkSpec}

/** Invariants of the two recall harnesses (s9, d13) and the weighted
  * quantiles (a11) at sf0.001 — properties the DuckDB oracle checks only
  * as opaque values, asserted here as the inequalities they must satisfy
  * by construction. */
class RecallHarnessSpec extends SparkSpec {

  test("s9: multi-probe recall dominates single-probe (superset candidates)") {
    val rows = Similarity.s9AnnRecall.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.length == 10, s"5 queries x 2 tiers expected, got ${rows.length}")
    val hitsByTier = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    // multi-probe probes a strict superset of buckets: a ground-truth hit
    // displaced from its top-5 implies a higher-cosine candidate that is
    // itself ground truth, so total hits cannot decrease
    assert(hitsByTier("multiprobe") >= hitsByTier("lsh"),
      s"multi-probe lost recall: $hitsByTier")
    rows.foreach { case (tier, q, k, hits, bp) =>
      assert(k == 5 && hits <= k && bp == hits * 10000 / k,
        s"$tier q$q: inconsistent (k=$k, hits=$hits, bp=$bp)")
    }
  }

  test("s10: index-tier recall agrees with an independent recount of s4/s6/s7 vs s1") {
    val rows = Similarity.s10IndexRecall.fn(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 15, s"5 queries x 3 tiers expected, got ${rows.length}")
    // independent recount: collect each tier's own top-5 sets and
    // intersect with s1's exact top-5, bypassing the harness joins
    def top5(q: NamedQuery): Map[Long, Set[Long]] =
      q.fn(spark, sf()).filter(org.apache.spark.sql.functions.col("rn") <= 5)
        .select("q_id", "nn_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = top5(Similarity.s1AnnBruteForce)
    val byTier = Map("ivf" -> top5(Similarity.s4AnnIvf), "pq" -> top5(Similarity.s7AnnPq),
      "sq" -> top5(Similarity.s6AnnQuantized))
    rows.foreach { case (tier, q, k, ak, hits, bp) =>
      val want = byTier(tier).getOrElse(q, Set.empty).intersect(exact(q)).size.toLong
      assert(k == 5 && hits == want && bp == hits * 10000 / k,
        s"$tier q$q: harness says hits=$hits, recount says $want (k=$k, bp=$bp)")
      assert(ak == byTier(tier).getOrElse(q, Set.empty).size.toLong,
        s"$tier q$q: approx_k mismatch")
    }
  }

  test("d13: precision is exactly 10000 bp (banded pairs are exact-verified)") {
    val r = Dedup.d13BandingRecall.fn(spark, sf()).collect().head
    val (ne, nb, hits, recall, prec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nb == hits && prec == 10000L,
      s"banded pairs escaped the exact verify: n_banded=$nb hits=$hits prec=$prec")
    assert(hits <= ne && recall == hits * 10000 / ne,
      s"recall inconsistent: n_exact=$ne hits=$hits recall=$recall")
  }

  test("a11: weighted quantiles are monotone and drawn from real lengths") {
    val rows = Analytics.a11WeightedQuantiles.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    val lengths = graft.tables.Tables.documents(spark, sf())
      .select("n_chars").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (src, tot, p25, p50, p90) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tot > 0, s"$src: empty token mass")
      assert(p25 <= p50 && p50 <= p90, s"$src: non-monotone ($p25, $p50, $p90)")
      assert(Set(p25, p50, p90).subsetOf(lengths),
        s"$src: quantile not an observed n_chars value")
    }
  }
}
