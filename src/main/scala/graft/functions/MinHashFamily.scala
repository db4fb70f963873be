package graft.functions

/** THE MinHash/LSH hash family — one derivation shared by every
  * consumer so none can drift from the others:
  *
  *  - the batch dedup tier's aggregate signature pipeline and its
  *    inlined DuckDB oracle literals (`queries/Dedup`),
  *  - the scan-side scalar Column form (`Dedup.bandValuesFor`) and its
  *    native kernel ([[BandValuesKernel]] / `graft_band_values`) used
  *    by the streaming detector (`stream/LiveNearDup`).
  *
  * Carter–Wegman universal family `h_i = (a_i·h0 + b_i) mod p` over the
  * [[CharFoldKernel]] mod-prime base hash, with per-band linear
  * combinations `(Σ c_r·h_r) mod p`; constants derive from splitmix64
  * (public mixing recipe).  Every intermediate fits int64
  * (a, h0 < p ≈ 2³⁰ ⟹ a·h0 < 2⁶⁰; 4 band products < 2⁶⁰ sum < 2⁶²),
  * which is what lets the whole pipeline replay exactly in DuckDB. */
object MinHashFamily {
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  val P: Long = CharFoldKernel.Prime

  /** splitmix64 — deterministic pseudo-random constants (public mixing
    * recipe; also seeds the d4 SimHash and s2 hyperplane families). */
  def mix64(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  val hashA: IndexedSeq[Long] =
    (0 until NumHashes).map(i => math.floorMod(mix64(0xA000L + i), P - 1) + 1)
  val hashB: IndexedSeq[Long] =
    (0 until NumHashes).map(i => math.floorMod(mix64(0xB000L + i), P))
  /** Per-band combination coefficients: band value = (Σ c_r·h_r) mod p. */
  val bandC: IndexedSeq[IndexedSeq[Long]] = (0 until Bands).map { b =>
    (0 until RowsPerBand).map(r =>
      math.floorMod(mix64(0xC000L + b * 16 + r), P - 1) + 1)
  }
}
