package graft.queries

import graft.SparkSpec

/** c17's next-epoch admission verified the s18/s19 way: the verdict
  * column ≡ c13's selector decision; the admitted top-k recounts from a
  * FULL plain-Scala replay (tokenize → charfold-bucket → count → weight
  * formula → score — a genuine third implementation, down to the
  * tokenizer); threshold overrides flip WHICH weight set scores
  * (full-pool retrained vs stored archive-trained), recount matching
  * both regimes. */
class RefreshedSelectionSpec extends SparkSpec {

  private type Admitted = (Long, String, Long, Long, String)

  private def admitted(dir: String): Seq[Admitted] =
    graft.SparkEntry.queries("c17_refreshed_selection")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSeq

  /** Spark-parity tokenization: `lower(trim(text))` trims ASCII SPACE
    * only (UTF8String.trim), and `split(_, "\\s+")` keeps trailing
    * empties (Spark passes limit -1). */
  private def tokensOf(text: String): Seq[Long] = {
    val t = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      .toLowerCase(java.util.Locale.ROOT)
    t.split("\\s+", -1).toSeq.map(tok =>
      graft.functions.CharFoldKernel.fold(
        org.apache.spark.unsafe.types.UTF8String.fromString(tok))
        % Curation.DsirBuckets)
  }

  /** Full plain-Scala replay of c17 under an explicit verdict. */
  private def recount(dir: String, verdict: String): Seq[Admitted] = {
    val docs = graft.tables.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => d._3 != null && d._3.nonEmpty)
      .map { case (id, src, text) => (id, src, tokensOf(text)) }.toSeq
    val B = Curation.DsirBuckets
    // per-bucket drift counts over the WHOLE pool (the c12/c13 relation)
    val per = docs.flatMap { case (id, src, bs) => bs.map(b => (b, id, src)) }
      .groupBy(_._1).map { case (b, ts) =>
        def n(p: ((Long, Long, String)) => Boolean) = ts.count(p).toLong
        b -> (n(t => t._2 % 10 != 7 && t._3 == Curation.DsirTarget),
          n(t => t._2 % 10 != 7 && t._3 != Curation.DsirTarget),
          n(t => t._2 % 10 == 7 && t._3 == Curation.DsirTarget),
          n(t => t._2 % 10 == 7 && t._3 != Curation.DsirTarget))
      }
    val ntA = per.values.map(_._1).sum
    val nrA = per.values.map(_._2).sum
    val tiT = per.values.map(_._3).sum
    val tiR = per.values.map(_._4).sum
    val w: Map[Long, Long] = per.map { case (b, (ctA, crA, ctI, nI)) =>
      b -> (if (verdict == "refresh")
        Math.floorDiv((ctA + ctI + 1) * (nrA + tiR + B) * 10000L,
          (crA + nI + 1) * (ntA + tiT + B))
      else
        Math.floorDiv((ctA + 1) * (nrA + B) * 10000L,
          (crA + 1) * (ntA + B)))
    }
    docs.filter(d => d._1 % 10 == 7 && d._2 != Curation.DsirTarget)
      .map { case (id, src, bs) =>
        val sw = bs.map(w).sum
        (id, src, bs.size.toLong, Math.floorDiv(sw, bs.size.toLong), verdict)
      }
      .sortBy(t => (-t._4, t._1))
      .take(Curation.DsirTopK)
  }

  test("c17 admits under the weights c13's verdict picked (sf0.001)") {
    val dir = sf()
    val selVerdict = graft.SparkEntry.queries("c13_refresh_decision")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap.apply("selector")
    val got = admitted(dir)
    assert(got.nonEmpty && got.forall(_._5 == selVerdict),
      s"c17 verdict column must equal c13's selector verdict ($selVerdict)")
    assert(got == recount(dir, selVerdict),
      s"c17 recount divergence (first rows): got=${got.take(3)}")
    // admission contract: incoming raw docs only
    assert(got.forall(t => t._1 % 10 == 7 && t._2 != Curation.DsirTarget))
  }

  test("threshold overrides flip WHICH weights score, recount matching both regimes") {
    val dir = sf()
    def runWith(st: Long, ben: Long) =
      withRefreshThresholds(st, ben)(admitted(dir))
    val refreshed = runWith(-1000000L, -1000000L)
    val kept = runWith(1000000L, 1000000L)
    assert(refreshed.nonEmpty && refreshed.forall(_._5 == "refresh"))
    assert(kept.nonEmpty && kept.forall(_._5 == "keep"))
    assert(refreshed == recount(dir, "refresh"))
    assert(kept == recount(dir, "keep"))
    // the retrained weights must move SOME admitted score on this
    // fixture, or serving-through-the-decision is unobservable here
    assert(refreshed.map(t => (t._1, t._4)) != kept.map(t => (t._1, t._4)),
      "retrained and stored weights admitted identical scores — vacuous fixture")
  }
}
