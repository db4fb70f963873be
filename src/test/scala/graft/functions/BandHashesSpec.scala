package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-pass `graft_band_hashes` kernel against the two Column forms
  * it fuses ([[graft.queries.Dedup.bandValuesFor]] /
  * [[graft.queries.Dedup.shingleHashSetFor]]) — element-wise equality on
  * real corpus text, gnarly whitespace, dup-heavy and degenerate inputs.
  * Transitively this pins the hashed live tier's banding ≡ the batch
  * aggregate path (BandValuesSpec + LiveNearDupParitySpec close the
  * rest of the chain). */
class BandHashesSpec extends SparkSpec {

  private def compareOn(texts: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(col("id"),
        graft.queries.Dedup.bandValuesFor(col("text")).as("bands_col"),
        graft.queries.Dedup.shingleHashSetFor(col("text")).as("hashes_col"),
        graft.queries.Dedup.bandHashesFor(col("text")).as("bh"))
      .collect()
    for (r <- rows) {
      val id = r.getLong(0)
      val bandsCol = Option(r.getSeq[java.lang.Long](1)).map(_.toSeq)
      val hashesCol = r.getSeq[Long](2).toSeq
      val bh = r.getStruct(3)
      val bandsK = bh.getSeq[java.lang.Long](0).toSeq
      val hashesK = bh.getSeq[Long](1).toSeq
      // bandValuesFor yields an EMPTY array for short/empty text and the
      // kernel's guarded branch does the same; where non-empty they must
      // agree lane for lane
      assert(bandsCol.getOrElse(Seq.empty) == bandsK,
        s"id=$id bands: column=$bandsCol kernel=$bandsK")
      assert(hashesCol == hashesK,
        s"id=$id hashes: column=$hashesCol kernel=$hashesK")
    }
  }

  test("kernel == both Column forms on the sf0.001 corpus") {
    val texts = graft.tables.Tables.documents(spark, sf())
      .select(col("text")).collect().map(_.getString(0)).toSeq
    compareOn(texts)
  }

  test("kernel == both Column forms on gnarly fixtures") {
    compareOn(Seq(
      "a b c",                        // minimal trigram
      "a b",                          // too short -> empty outputs
      "",                             // empty
      "   ",                          // whitespace only
      "x\t y\n z  w",                 // mixed whitespace separators
      "dup dup dup dup dup",          // duplicate shingles collapse
      "one two three four five six",  // several shingles
      ("tok " * 200).trim,            // single repeated token, long doc
      "Ünïcode is nöt in the corpus but must not crash ünïcode folds"))
  }

  test("null text and null handling do not throw") {
    val s = spark
    import s.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = df.select(graft.queries.Dedup.bandHashesFor(col("text")).as("bh"))
      .collect().head.getStruct(0)
    assert(r.getSeq[Long](0).isEmpty && r.getSeq[Long](1).isEmpty)
  }
}
