package graft.queries

import graft.SparkSpec

/** d14's compositional contract: the incremental path (incoming-slice
  * band-key probe + exact verify) finds EXACTLY d3's verified relation
  * restricted to pairs touching the incoming slice — it can neither
  * find nor lose a pair the batch tier wouldn't — and labels each pair
  * correctly as new-old (batch doc hit the archive) or new-new (batch
  * self-dup). */
class IncrementalDedupSpec extends SparkSpec {

  test("d14 == d3's verified relation restricted to the incoming slice (sf0.01)") {
    val dir = sf("sf0.01")
    val d3 = Dedup.bandedJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = d3.filter(p => p._1 % 10 == 7 || p._2 % 10 == 7)
    assert(expected.nonEmpty, "no near-dup pair touches the incoming slice — vacuous")

    val got = Dedup.d14IncrementalDedup.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.map(g => (g._1, g._2, g._3)).toSet == expected,
      s"incremental relation diverges from d3-restricted: got=${got.toSeq}")
    got.foreach { g =>
      assert(g._1 % 10 == 7 || g._2 % 10 == 7, s"pair outside the slice: $g")
      val want = if (g._1 % 10 == 7 && g._2 % 10 == 7) "new-new" else "new-old"
      assert(g._4 == want, s"mislabeled pair: $g")
    }
    // the sf0.01 corpus plants both label kinds — keep that true, or the
    // labeling path stops being exercised
    assert(got.exists(_._4 == "new-new") && got.exists(_._4 == "new-old"),
      s"fixture no longer exercises both pair types: ${got.map(_._4).distinct.toSeq}")
  }
}
