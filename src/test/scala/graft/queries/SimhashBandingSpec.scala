package graft.queries

import graft.SparkSpec

/** d4's counterpart to MultimodalBandingSpec: the Manku single-band
  * pigeonhole for 60-bit SimHash fingerprints split into 5 × 12-bit
  * bands — hamming ≤ 4 corrupts at most 4 bands, leaving ≥ 1 intact, so
  * banded candidates have 100% recall at every level the guarantee
  * covers.  The real-corpus completeness test (QueryPacksSpec) checks
  * against brute force but only at the hamming levels the corpus happens
  * to contain; this sweep PLANTS variants at every level 1–4 with the
  * flips spread across distinct bands (the adversarial placement), and
  * at 5–6 packed into one band — where the bands still surface the pair
  * and it must be the exact verify that excludes it. */
class SimhashBandingSpec extends SparkSpec {

  private val Golden = 0x9E3779B97F4A7C15L
  private val VarOff = 100000L

  /** 60-bit deterministic pseudo-random fingerprint. */
  private def baseFp(id: Long): Long = (id * Golden + 0x3C6EF372FE94F82AL) >>> 4

  /** Flip `h` bits: one per band for h ≤ 4 (bands are 12 bits wide);
    * for h = 5/6, all flips inside band 0. */
  private def flipped(fp: Long, h: Int, i: Long): Long = {
    val bits =
      if (h <= 4) (0 until h).map(b => b * 12 + ((i + b) % 12).toInt)
      else 0 until h
    fp ^ bits.map(1L << _).reduce(_ | _)
  }

  test("banded candidates recover 100% of planted hamming 1-4 pairs") {
    import spark.implicits._
    val rows = for {
      h <- 1 to 4
      i <- 0L until 10L
      id = h * 1000L + i
      fp = baseFp(id)
      r <- Seq((id, fp), (id + VarOff, flipped(fp, h, i)))
    } yield r
    val out = Dedup.simhashCandidatePairs(rows.toDF("doc_id", "fp"), maxHamming = 4)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      h <- 1 to 4
      i <- 0L until 10L
      id = h * 1000L + i
    } yield (id, id + VarOff, h)).toSet
    assert(out == expected, s"missed=${expected -- out} spurious=${out -- expected}")
  }

  test("hamming 5-6: bands still produce the candidate; the verify cut excludes it") {
    import spark.implicits._
    val rows = for {
      h <- 5 to 6
      i <- 0L until 10L
      id = h * 1000L + i
      fp = baseFp(id)
      r <- Seq((id, fp), (id + VarOff, flipped(fp, h, i)))
    } yield r
    val df = rows.toDF("doc_id", "fp")
    val planted = (for { h <- 5 to 6; i <- 0L until 10L; id = h * 1000L + i }
      yield (id, id + VarOff)).toSet

    val candidates = Dedup.simhashCandidatePairs(df, maxHamming = 60)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(candidates), s"bands wrongly excluded: ${planted -- candidates}")

    val verified = Dedup.simhashCandidatePairs(df, maxHamming = 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.intersect(planted).isEmpty,
      s"verify failed to exclude hamming>4: ${verified.intersect(planted)}")
  }
}
