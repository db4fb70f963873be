package graft.queries

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Independent plain-Scala recount of d17's cross-source overlap sketch
  * (the SourceOverlapSpec pattern applied to the estimator): shingle,
  * hash, keep the k smallest distinct, and run Beyer et al.'s multiset
  * estimators with local loops — and require the distributed query to
  * agree row-for-row.  Three planted regimes:
  *
  *  - SMALL sources (< k distinct shingles): the sketch IS the set, the
  *    exact branch fires, and d17's numbers must equal d16-style exact
  *    set arithmetic — equality, not tolerance.
  *  - LARGE sources with ENGINEERED 50% overlap (> k shingles): the
  *    estimator branch fires and the Jaccard estimate must land within
  *    3σ = 3·√(J(1−J)/k) of the planted truth.
  *  - The real sf0.001 corpus: recount row-for-row (the determinism
  *    gate the DuckDB oracle also pins, here against a third
  *    implementation).
  */
class OverlapSketchSpec extends SparkSpec {

  private val K = 256
  private val P = 1000000007L

  private def shinglesOf(text: String): Set[String] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (text.trim.isEmpty || w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  private def fold(sh: String): Long =
    graft.functions.CharFoldKernel.fold(UTF8String.fromString(sh))

  /** The expected d17 rows from raw (source, text) pairs — the local
    * replay of sketch + estimator. */
  private def expected(rows: Seq[(String, String)])
      : Seq[(String, String, Boolean, Long, Long, Long, Long)] = {
    val mins: Map[String, Vector[Long]] = rows
      .filter { case (_, t) => t != null && t.nonEmpty }
      .groupBy(_._1)
      .map { case (src, rs) =>
        src -> rs.iterator.flatMap(r => shinglesOf(r._2)).map(fold).toSet
          .toVector.sorted.take(K)
      }
      .filter(_._2.nonEmpty)
    val srcs = mins.keys.toSeq.sorted
    for { a <- srcs; b <- srcs if a < b } yield {
      val (ma, mb) = (mins(a), mins(b))
      val ab = ma.toSet & mb.toSet
      val uni = (ma ++ mb).distinct.sorted
      val u = uni.take(K)
      val exact = ma.size < K && mb.size < K
      val rho = u.count(ab)
      def estOf(v: Vector[Long]): Long =
        if (v.size < K) v.size.toLong else (K - 1).toLong * P / v(K - 1)
      val estU = if (exact) uni.size.toLong else (K - 1).toLong * P / u(K - 1)
      val shared = if (exact) ab.size.toLong else rho.toLong * estU / K
      val j = if (exact) 10000L * ab.size / uni.size else 10000L * rho / K
      (a, b, exact, estOf(ma), estOf(mb), shared, j)
    }
  }

  private def runD17(dir: String): Seq[(String, String, Boolean, Long, Long, Long, Long)] =
    TextOps.d17OverlapSketch.fn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  private def writeDocs(prefix: String, docs: Seq[(Long, String, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** w words from a deterministic per-source vocabulary; overlapping
    * sources draw a prefix of their words from a shared pool. */
  private def prose(vocabPrefix: String, shared: Int, own: Int): String =
    ((0 until shared).map(i => s"shared$i") ++
      (0 until own).map(i => s"$vocabPrefix$i")).mkString(" ")

  test("small sources: the exact branch equals d16-style set arithmetic") {
    // each source has ~12 shingles — far under k, sketches are complete
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "web"),
      (1L, "the quick brown fox sat under an old oak tree", "wiki"),
      (2L, "completely disjoint correspondence nobody repeats anywhere at all", "mail"))
    val dir = writeDocs("d17-small", docs)
    val got = runD17(dir)
    val want = expected(docs.map { case (_, t, s) => (s, t) })
    assert(got == want, s"small-source mismatch:\n got  $got\n want $want")
    assert(got.forall(_._3), "all sketches are complete — every pair must take the exact branch")
    // web/wiki share exactly the 'the quick brown' + 'quick brown fox'
    // shingles; exact-branch numbers are set arithmetic, verifiable by eye
    val ww = got.find(r => r._1 == "web" && r._2 == "wiki").get
    assert(ww._6 == 2L, s"web/wiki share exactly 2 shingles: $ww")
    val wm = got.find(r => r._1 == "mail" && r._2 == "web").get
    assert(wm._6 == 0L && wm._7 == 0L, s"mail shares nothing: $wm")
  }

  test("large sources with planted 50% overlap: estimator within 3σ of truth") {
    // two sources, each one long doc of 600 tokens: 300 shared + 300 own
    // → each has 598 distinct shingles (> k), cross-source shared
    // shingles are the 298 inside the shared prefix; J = 298/898
    val ta = prose("alpha", 300, 300)
    val tb = prose("beta", 300, 300)
    val dir = writeDocs("d17-large", Seq((0L, ta, "srcA"), (1L, tb, "srcB")))
    val got = runD17(dir)
    assert(got.size == 1 && !got.head._3, "must take the estimator branch")
    val want = expected(Seq(("srcA", ta), ("srcB", tb)))
    assert(got == want, s"estimator recount mismatch:\n got  $got\n want $want")
    val na = shinglesOf(ta).size.toDouble
    val shared = (shinglesOf(ta) & shinglesOf(tb)).size.toDouble
    val jTrue = shared / (2 * na - shared)
    val sigma = math.sqrt(jTrue * (1 - jTrue) / K)
    val jEst = got.head._7 / 10000.0
    assert(math.abs(jEst - jTrue) <= 3 * sigma,
      f"estimate $jEst%.4f vs truth $jTrue%.4f exceeds 3σ = ${3 * sigma}%.4f")
    // per-source distinct estimates within 3/√k relative error
    assert(math.abs(got.head._4 - na) / na <= 3.0 / math.sqrt(K.toDouble),
      s"per-source estimate ${got.head._4} vs $na")
  }

  test("d17 equals the local recount on the sf0.001 corpus") {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = expected(raw)
    val got = runD17(sf())
    assert(want.nonEmpty && got == want,
      s"sf0.001 mismatch: got ${got.size} rows, want ${want.size}")
  }

  // ------------------------------------------------------------- d18
  /** The expected d18 rows — the three-way estimator as local loops. */
  private def expected3(rows: Seq[(String, String)])
      : Seq[(String, String, String, Boolean, Long, Long, Long, Option[Long])] = {
    val mins: Map[String, Vector[Long]] = rows
      .filter { case (_, t) => t != null && t.nonEmpty }
      .groupBy(_._1)
      .map { case (src, rs) =>
        src -> rs.iterator.flatMap(r => shinglesOf(r._2)).map(fold).toSet
          .toVector.sorted.take(K)
      }
      .filter(_._2.nonEmpty)
    val srcs = mins.keys.toSeq.sorted
    for { a <- srcs; b <- srcs if a < b; c <- srcs if b < c } yield {
      val (ma, mb, mc) = (mins(a), mins(b), mins(c))
      val uni = (ma ++ mb ++ mc).distinct.sorted
      val u = uni.take(K)
      val exact = ma.size < K && mb.size < K && mc.size < K
      val iab = ma.toSet & mb.toSet
      val iabc = iab & mc.toSet
      val rhoAb = u.count(iab).toLong
      val rhoAbc = u.count(iabc).toLong
      val estU = if (exact) uni.size.toLong else (K - 1).toLong * P / u(K - 1)
      val estAbc = if (exact) iabc.size.toLong else rhoAbc * estU / K
      val j3 = if (exact) 10000L * iabc.size / uni.size else 10000L * rhoAbc / K
      val nAb = if (exact) iab.size.toLong else rhoAb
      val nAbc = if (exact) iabc.size.toLong else rhoAbc
      val contain = if (nAb == 0) None else Some(10000L * nAbc / nAb)
      (a, b, c, exact, estU, estAbc, j3, contain)
    }
  }

  private def runD18(dir: String)
      : Seq[(String, String, String, Boolean, Long, Long, Long, Option[Long])] =
    TextOps.d18ThreeWayOverlap.fn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))

  test("d18 exact branch equals plain set arithmetic incl. containment and its NULL case") {
    // blog repeats exactly ONE of web∩wiki's two shared shingles; mail
    // is disjoint from everything
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "web"),
      (1L, "the quick brown fox sat under an old oak tree", "wiki"),
      (2L, "the quick brown cat naps all day long somewhere", "blog"),
      (3L, "completely disjoint correspondence nobody repeats anywhere at all", "mail"))
    val dir = writeDocs("d18-small", docs)
    val got = runD18(dir)
    val want = expected3(docs.map { case (_, t, s) => (s, t) })
    assert(got == want, s"small-source mismatch:\n got  $got\n want $want")
    assert(got.forall(_._4), "complete sketches — every triple must take the exact branch")
    // eyeball case: blog∩web = {'the quick brown'} ⊆ wiki → containment 10000
    val bww = got.find(r => r._1 == "blog" && r._2 == "web" && r._3 == "wiki").get
    assert(bww._8 == Some(10000L), s"blog∩web fully inside wiki: $bww")
    // mail-containing triples have empty A∩B evidence → NULL, never 0/0
    val bmw = got.find(r => r._1 == "blog" && r._2 == "mail").get
    assert(bmw._8 == None, s"blog∩mail is empty — containment must be NULL: $bmw")
  }

  test("d18 estimator branch: planted triple truth within tolerance, recount exact") {
    // three large sources sharing a 300-word core; srcC repeats only the
    // first 150 core words → true containment(A∩B in C) ≈ 148/298
    val ta = prose("alpha", 300, 300)
    val tb = prose("beta", 300, 300)
    val tc = ((0 until 150).map(i => s"shared$i") ++
      (0 until 450).map(i => s"gamma$i")).mkString(" ")
    val dir = writeDocs("d18-large",
      Seq((0L, ta, "srcA"), (1L, tb, "srcB"), (2L, tc, "srcC")))
    val got = runD18(dir)
    assert(got.size == 1 && !got.head._4, "must take the estimator branch")
    // strict gate: the distributed query equals the local replay
    val want = expected3(Seq(("srcA", ta), ("srcB", tb), ("srcC", tc)))
    assert(got == want, s"estimator recount mismatch:\n got  $got\n want $want")
    // estimator quality: containment within ±1500 bp of the planted truth
    val sa = shinglesOf(ta); val sb = shinglesOf(tb); val sc = shinglesOf(tc)
    val cTrue = 10000.0 * (sa & sb & sc).size / (sa & sb).size
    val cEst = got.head._8.get.toDouble
    assert(math.abs(cEst - cTrue) <= 1500,
      f"containment estimate $cEst%.0f vs truth $cTrue%.0f")
    // and the triple Jaccard within 3σ
    val uni = (sa ++ sb ++ sc).size.toDouble
    val jTrue = (sa & sb & sc).size / uni
    val sigma = math.sqrt(jTrue * (1 - jTrue) / K)
    assert(math.abs(got.head._7 / 10000.0 - jTrue) <= 3 * sigma,
      f"j3 estimate ${got.head._7 / 10000.0}%.4f vs truth $jTrue%.4f (3σ=${3 * sigma}%.4f)")
  }

  test("d18 triple budget guard: filtered ≡ exhaustive above the pairwise floor") {
    // r13 verdict #6 — the S³ budget guard: with the conf'd floor set,
    // triples enumerate from the qualifying-pair relation; the result
    // must equal the exhaustive enumeration restricted to triples whose
    // THREE pairwise jaccards all clear the floor, on the real corpus
    val dir = sf()
    val exhaustive = runD18(dir)
    val pairJ = runD17(dir).map(r => (r._1, r._2) -> r._7).toMap
    // a floor that actually separates (some pairs above, some below)
    val floors = Seq(1L, 50L, 200L)
    for (floor <- floors) {
      val want = exhaustive.filter { t =>
        pairJ((t._1, t._2)) >= floor && pairJ((t._1, t._3)) >= floor &&
          pairJ((t._2, t._3)) >= floor
      }
      spark.conf.set("spark.graft.overlap.tripleMinPairJaccardBp", floor.toString)
      val got = try runD18(dir)
        finally spark.conf.unset("spark.graft.overlap.tripleMinPairJaccardBp")
      assert(got == want,
        s"floor=$floor: got ${got.size} triples, want ${want.size}:\n" +
          s" got  $got\n want $want")
    }
    // the guard must separate somewhere on this corpus, or the test is inert
    val some = exhaustive.count { t =>
      pairJ((t._1, t._2)) >= 50L && pairJ((t._1, t._3)) >= 50L &&
        pairJ((t._2, t._3)) >= 50L }
    assert(some > 0 && some < exhaustive.size,
      s"floor 50 must drop SOME but not ALL triples (kept $some of ${exhaustive.size})")
  }

  test("d18 equals the local recount on the sf0.001 corpus") {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = expected3(raw)
    val got = runD18(sf())
    assert(want.nonEmpty && got == want,
      s"sf0.001 mismatch: got ${got.size} rows, want ${want.size}")
  }
}
