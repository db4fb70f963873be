package graft.queries

import graft.SparkSpec

/** c18's physical packing verified two ways: the placement arithmetic
  * recounts in plain Scala from the relation's own (split, source,
  * doc_id, n_tokens) stream (a running concat-then-chunk walk — the
  * third implementation of the placement step; tokenization itself is
  * c3's oracled expression, shared verbatim), and the placement
  * reconciles against c3's oracled aggregates: per (split, source) the
  * sequence count, the straddler count and the token mass all derive
  * from the emitted rows. */
class PackingExecutionSpec extends SparkSpec {

  private type Placed = (String, String, Long, Long, Long, Long, Long)

  private def placed(dir: String): Seq[Placed] =
    graft.SparkEntry.queries("c18_packing_execution")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

  private val B = Curation.SeqBudget

  /** The concat-then-chunk walk — the third implementation of the
    * placement arithmetic, applied per (split, source) stream. */
  private def walkInvariants(got: Seq[Placed]): Unit = {
    got.groupBy(t => (t._1, t._2)).foreach { case ((split, source), rows) =>
      val ordered = rows.sortBy(_._3)
      assert(ordered == rows, s"($split,$source) rows must come doc_id-ordered")
      var cum = 0L
      ordered.foreach { case (_, _, docId, n, seqFirst, offset, seqLast) =>
        assert(n >= 1L, s"doc $docId: empty docs were filtered upstream")
        assert(seqFirst == cum / B, s"doc $docId seq_first")
        assert(offset == cum % B, s"doc $docId offset")
        assert(seqLast == (cum + n - 1) / B, s"doc $docId seq_last")
        cum += n
      }
    }
  }

  private def reconcile(dir: String): Long = {
    val got = placed(dir).groupBy(t => (t._1, t._2))
    val plan = graft.SparkEntry.queries("c3_sequence_packing")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.keySet == plan.keySet)
    got.foreach { case (key, rows) =>
      val (nDocs, totalTokens, nSeqs, nStraddlers) = plan(key)
      assert(rows.size.toLong == nDocs, s"$key n_docs")
      assert(rows.map(_._4).sum == totalTokens, s"$key total_tokens")
      assert(rows.map(_._7).max + 1 == nSeqs, s"$key n_seqs")
      assert(rows.count(t => t._7 > t._5).toLong == nStraddlers, s"$key n_straddlers")
      // every sequence id in [0, n_seqs) is actually occupied: chunking
      // a concatenated stream leaves no empty sequences
      val occupied = rows.flatMap(t => t._5 to t._7).toSet
      assert(occupied == (0L until nSeqs).toSet, s"$key seq coverage")
    }
    plan.values.map(_._4).sum
  }

  test("placement arithmetic recounts from the doc stream (sf0.001)") {
    val dir = sf()
    val got = placed(dir)
    assert(got.nonEmpty)
    walkInvariants(got)
    // globally ordered output
    assert(got == got.sortBy(t => (t._1, t._2, t._3)))
  }

  test("placement reconciles against c3's oracled plan aggregates (sf0.001)") {
    reconcile(sf()): Unit
  }

  test("a planted boundary-crossing stream exercises straddling and multi-sequence spans") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c18fix").toString
    // one ~5000-token doc (spans 3 sequences), then enough ~600-token
    // docs that several placements cross a 2048 boundary
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = (Seq((0L, words(5000, "long"), "src0")) ++
      (1L to 30L).map(i => (i, words(600, s"d$i-"), if (i % 2 == 0) "src0" else "src1")))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = placed(dir)
    walkInvariants(got)
    val straddlers = reconcile(dir)
    assert(straddlers > 0, "the planted stream must straddle boundaries")
    // the 5000-token doc spans ceil(5000/2048)+ sequences wherever it
    // starts — at least 3 from offset 0
    val longDoc = got.find(_._3 == 0L).get
    assert(longDoc._7 - longDoc._5 >= 2L,
      s"the 5000-token doc must span >= 3 sequences: $longDoc")
  }
}
