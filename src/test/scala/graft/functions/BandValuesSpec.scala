package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The native one-pass band kernel pinned against the unrolled Column
  * form it replaced (16 separate `array_min(transform(...))` lanes,
  * each re-folding the charfold base hash): element-wise equality on
  * real corpus shingle arrays AND on crafted edge inputs (single
  * shingle, duplicate shingles, null elements).  The live≡batch band
  * parity vs the AGGREGATE signature path is pinned separately in
  * LiveNearDupParitySpec — together the three formulations are mutually
  * pinned. */
class BandValuesSpec extends SparkSpec {

  /** The pre-kernel unrolled Column form, verbatim. */
  private def unrolledBands(shingleArr: Column): Column = {
    import MinHashFamily._
    val sigs = (0 until NumHashes).map { i =>
      array_min(transform(shingleArr,
        sh => (call_function("graft_charfold", sh) * hashA(i) + hashB(i)) % P))
    }
    array((0 until Bands).map { b =>
      (0 until RowsPerBand)
        .map(r => sigs(b * RowsPerBand + r) * bandC(b)(r))
        .reduce(_ + _) % P
    }: _*)
  }

  test("kernel == unrolled Column form on real corpus shingle arrays") {
    graft.sentiment.GraftFunctions.register(spark)
    val docs = graft.tables.Tables.documents(spark, sf("sf0.01"))
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(expr(
        "array_distinct(transform(sequence(1, greatest(size(w) - 2, 1)), " +
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), " +
          "element_at(w, i + 2))))").as("sh"))
    val cached = docs.persist()
    try {
      assert(cached.count() >= 100, "fixture too small to be meaningful")
      val mismatches = cached
        .select(call_function("graft_band_values", col("sh")).as("k"),
          unrolledBands(col("sh")).as("u"))
        .filter(col("k") =!= col("u"))
        .count()
      assert(mismatches == 0L, s"$mismatches documents band differently under the kernel")
    } finally { cached.unpersist(); () }
  }

  test("kernel edge cases: single/duplicate/null-element shingle arrays") {
    val s = spark
    import s.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val rows: Seq[Seq[String]] = Seq(
      Seq("one two three"),
      Seq("a b c", "a b c", "x y z"),
      Seq("a b c", null, "x y z"))
    val df = rows.toDF("sh")
      .select(call_function("graft_band_values", col("sh")).as("k"),
        unrolledBands(col("sh")).as("u"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"kernel ${r.getSeq[Long](0)} != unrolled ${r.getSeq[Long](1)}")
    }
  }
}
