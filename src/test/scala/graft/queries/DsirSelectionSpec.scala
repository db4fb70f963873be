package graft.queries

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Independent plain-Scala recount of c11's DSIR-style importance
  * selection (the SourceOverlapSpec pattern): tokenize, hash, count,
  * weight and score with local loops — no Spark expressions, no shared
  * helpers — and require the distributed query to agree row-for-row on
  * a PLANTED two-domain pool whose ranking is known by construction,
  * and on the real sf0.001 corpus.  The DuckDB oracle already pins
  * values cross-engine; this pins them against a third, loop-written
  * implementation — and pins the SEMANTICS: raw docs written in the
  * target domain's vocabulary must outrank docs written in a disjoint
  * one (the selection actually selects).
  */
class DsirSelectionSpec extends SparkSpec {

  private val B = 1024L
  private val Target = "src0"

  /** Local replay of the scoring pipeline from raw (doc_id, text,
    * source) rows: Laplace likelihood-ratio weights per charfold bucket,
    * mean token weight per raw doc in basis points, top-k by
    * (score desc, doc_id). */
  private def expectedSelection(rows: Seq[(Long, String, String)], topK: Int)
      : Seq[(Long, String, Long, Long)] = {
    def buckets(text: String): Seq[Long] =
      text.trim.toLowerCase.split("\\s+").toSeq
        .map(t => graft.functions.CharFoldKernel.fold(UTF8String.fromString(t)) % B)
    val live = rows.filter { case (_, t, _) => t != null && t.nonEmpty }
    val ct = new Array[Long](B.toInt)
    val cr = new Array[Long](B.toInt)
    live.foreach { case (_, t, src) =>
      val arr = if (src == Target) ct else cr
      buckets(t).foreach(b => arr(b.toInt) += 1)
    }
    val nt = ct.sum; val nr = cr.sum
    def w(b: Int): Long =
      Math.floorDiv((ct(b) + 1) * (nr + B) * 10000L, (cr(b) + 1) * (nt + B))
    live.filter(_._3 != Target).map { case (id, t, src) =>
      val bs = buckets(t)
      val sw = bs.map(b => w(b.toInt)).sum
      (id, src, bs.size.toLong, Math.floorDiv(sw, bs.size.toLong))
    }.sortBy { case (id, _, _, score) => (-score, id) }.take(topK)
  }

  private def runC11(dir: String): Seq[(Long, String, Long, Long)] =
    Curation.c11DsirSelection.fn(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("c11 equals the local recount AND separates a planted two-domain pool") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c11-planted").toString
    // Target domain (src0) speaks "chemistry"; the raw pool has 4 docs in
    // the target's vocabulary (must rank top) and 4 in a disjoint
    // "finance" vocabulary (must rank bottom), plus filter-exercising rows
    val chem = Seq(
      "the reaction yields a stable molecule under catalytic conditions",
      "every molecule binds the enzyme at a specific reaction site",
      "catalytic enzyme kinetics govern the reaction rate constants",
      "a stable isotope labels the molecule through the reaction")
    val chemLike = Seq(
      "this molecule shows a catalytic reaction with the enzyme",
      "stable reaction kinetics for the labeled molecule",
      "the enzyme accelerates a stable catalytic reaction",
      "isotope evidence for the molecule binding site")
    val finance = Seq(
      "quarterly revenue beat consensus estimates despite margin pressure",
      "the portfolio rebalanced toward treasury bonds and cash",
      "dividend growth outpaced inflation across the index",
      "credit spreads widened as issuance volumes collapsed")
    val docs =
      chem.zipWithIndex.map { case (t, i) => (i.toLong, t, Target) } ++
      chemLike.zipWithIndex.map { case (t, i) => (100L + i, t, "srcA") } ++
      finance.zipWithIndex.map { case (t, i) => (200L + i, t, "srcB") } ++
      Seq((300L, null.asInstanceOf[String], "srcB"), (301L, "", "srcB"))
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = expectedSelection(docs, topK = 100)
    val got = runC11(dir)
    assert(got == want, s"planted selection mismatch:\n got  $got\n want $want")
    // the semantics: every chem-like doc outranks every finance doc
    val rank = got.map(_._1).zipWithIndex.toMap
    for (a <- 100L to 103L; b <- 200L to 203L)
      assert(rank(a) < rank(b),
        s"target-domain doc $a must outrank disjoint-domain doc $b: $got")
  }

  test("c11 equals the local recount on the sf0.001 corpus") {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = expectedSelection(raw, topK = 100)
    val got = runC11(sf())
    assert(want.nonEmpty, "sf0.001 must have a non-empty raw pool")
    assert(got == want, s"sf0.001 selection mismatch: got ${got.take(3)}, want ${want.take(3)}")
  }
}
