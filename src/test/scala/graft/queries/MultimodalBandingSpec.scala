package graft.queries

import graft.SparkSpec

/** Pins the pair-band pigeonhole guarantee m5's scaladoc claims: hamming
  * ≤ 6 over a 62-bit hash split into 8 bands leaves ≥ 2 bands intact, so
  * every true near-dup pair shares at least one of the C(8,2)=28 pair-band
  * keys — 100% candidate recall, with the exact verify doing the ≤ 6 cut.
  *
  * Sweep: deterministic base hashes, variants planted at hamming 1–6 with
  * the flipped bits SPREAD across h different bands (the adversarial case
  * for banding — h corrupted bands is the maximum h flips can reach), all
  * must be recovered.  At hamming 7 and 8 (flips packed into band 0, so 7
  * bands stay intact) the BANDS still surface the pair as a candidate —
  * proving it is the verify stage, not the banding, that excludes them. */
class MultimodalBandingSpec extends SparkSpec {

  private val Golden = 0x9E3779B97F4A7C15L
  private val VarOff = 100000L

  /** 62-bit deterministic pseudo-random hash. */
  private def basePh(id: Long): Long = (id * Golden + 0x3C6EF372FE94F82AL) >>> 2

  /** Flip `h` bits: one bit in each of bands 0..h-1 for h ≤ 6 (maximal
    * band spread); for h = 7/8, pack all flips into band 0 (bits 0..h-1). */
  private def flipped(ph: Long, h: Int, i: Long): Long = {
    val bits =
      if (h <= 6) (0 until h).map(b => b * 8 + ((i + b) % 8).toInt)
      else 0 until h
    ph ^ bits.map(1L << _).reduce(_ | _)
  }

  test("pair-band candidates recover 100% of planted hamming 1-6 pairs") {
    import spark.implicits._
    val rows = for {
      h <- 1 to 6
      i <- 0L until 10L
      id = h * 1000L + i
      ph = basePh(id)
      r <- Seq((id, ph), (id + VarOff, flipped(ph, h, i)))
    } yield r
    val out = Multimodal.phashCandidatePairs(rows.toDF("doc_id", "ph"), maxHamming = 6)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = (for {
      h <- 1 to 6
      i <- 0L until 10L
      id = h * 1000L + i
    } yield (id, id + VarOff, h)).toSet
    assert(out == expected,
      s"missed=${expected -- out} spurious=${out -- expected}")
  }

  test("hamming 7-8: the bands still produce the candidate; the verify cut excludes it") {
    import spark.implicits._
    val rows = for {
      h <- 7 to 8
      i <- 0L until 10L
      id = h * 1000L + i
      ph = basePh(id)
      r <- Seq((id, ph), (id + VarOff, flipped(ph, h, i)))
    } yield r
    val df = rows.toDF("doc_id", "ph")
    val planted = (for { h <- 7 to 8; i <- 0L until 10L; id = h * 1000L + i }
      yield (id, id + VarOff)).toSet

    // without the verify cut, every planted pair must be a band candidate
    // (7 of 8 bands intact => many intact pairs)
    val candidates = Multimodal.phashCandidatePairs(df, maxHamming = 62)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(candidates),
      s"bands wrongly excluded: ${planted -- candidates}")

    // with the production cut, none may survive
    val verified = Multimodal.phashCandidatePairs(df, maxHamming = 6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.intersect(planted).isEmpty,
      s"verify failed to exclude hamming>6: ${verified.intersect(planted)}")
  }
}
