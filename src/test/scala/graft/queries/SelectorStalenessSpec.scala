package graft.queries

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Independent plain-Scala recount of c12's selector-staleness audit
  * (the PqStalenessSpec pattern applied to the stored DSIR selector):
  * recompute buckets, archive counts, stored weights and the
  * cross-multiplied shift with local loops on a planted fixture whose
  * drift is known by construction, plus the conservation invariant
  * (Σ shift_x over ALL buckets = 0 exactly) and the real sf0.001
  * corpus row-for-row. */
class SelectorStalenessSpec extends SparkSpec {

  private val B = 1024L
  private val Target = "src0"

  private def buckets(text: String): Seq[Long] =
    text.trim.toLowerCase.split("\\s+").toSeq
      .map(t => graft.functions.CharFoldKernel.fold(UTF8String.fromString(t)) % B)

  /** Full per-bucket relation (before the top-k cut) from raw
    * (doc_id, text, source) rows. */
  private def perBucket(rows: Seq[(Long, String, String)])
      : Map[Long, (Long, Long, Long)] = {
    val m = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    rows.filter { case (_, t, _) => t != null && t.nonEmpty }
      .foreach { case (id, t, src) =>
        val inc = id % 10 == 7
        buckets(t).foreach { b =>
          val (ct, cr, ni) = m.getOrElse(b, (0L, 0L, 0L))
          m(b) = (
            ct + (if (!inc && src == Target) 1L else 0L),
            cr + (if (!inc && src != Target) 1L else 0L),
            ni + (if (inc && src != Target) 1L else 0L))
        }
      }
    m.toMap
  }

  private def expected(rows: Seq[(Long, String, String)], topK: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    val per = perBucket(rows)
    val ntA = per.values.map(_._1).sum
    val nrA = per.values.map(_._2).sum
    val totInc = per.values.map(_._3).sum
    per.toSeq.map { case (b, (ct, cr, ni)) =>
      val shift = ni * nrA - cr * totInc
      val w = Math.floorDiv((ct + 1) * (nrA + B) * 10000L, (cr + 1) * (ntA + B))
      (b, cr, ni, shift, w)
    }.sortBy { case (b, _, _, shift, _) => (-math.abs(shift), b) }.take(topK)
  }

  private def runC12(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    Curation.c12SelectorStaleness.fn(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("planted incoming-vocabulary drift is flagged; conservation holds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c12-planted").toString
    // archive raw docs (ids avoid %10==7) speak "legacy"; incoming raw
    // docs (ids ≡ 7 mod 10) speak a BRAND-NEW vocabulary — its buckets
    // have cr_arch = 0 and must dominate the positive tail, while
    // legacy-only buckets drift negative; the target slice trains the
    // stored weights and never contributes to the shift
    val target = (0 until 4).map(i =>
      (i * 10L, s"curated reference prose sample number$i", Target))
    val archRaw = (0 until 6).map(i =>
      (i * 10L + 1, s"legacy corpus speaks aboutold topics item$i", "srcA"))
    val incRaw = (0 until 6).map(i =>
      (i * 10L + 7, s"freshwave vocabulary neverseen before token$i", "srcB"))
    val docs = target ++ archRaw ++ incRaw ++
      Seq((97L, null.asInstanceOf[String], "srcB"), (107L, "", "srcB"))
    docs.map { case (id, t, src) =>
      (id, t, "en", src, Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val want = expected(docs, topK = 20)
    val got = runC12(dir)
    assert(got == want, s"planted mismatch:\n got  $got\n want $want")

    // conservation: over ALL buckets the shift sums to exactly zero
    val per = perBucket(docs)
    val nrA = per.values.map(_._2).sum
    val totInc = per.values.map(_._3).sum
    assert(per.values.map { case (_, cr, ni) => ni * nrA - cr * totInc }.sum == 0L,
      "Σ shift_x over all buckets must be exactly 0")

    // semantics: the strongest positive drift comes from never-seen
    // incoming vocabulary (cr_arch = 0, n_inc > 0)
    val top = got.head
    assert(top._2 == 0L && top._3 > 0L && top._4 > 0L,
      s"top drift must be a brand-new incoming bucket: $top")
    // legacy-only buckets (cr_arch > 0, n_inc = 0) drift negative
    assert(got.exists(r => r._2 > 0L && r._3 == 0L && r._4 < 0L),
      s"legacy-only buckets must appear with negative shift: $got")
  }

  test("c12 equals the local recount on the sf0.001 corpus") {
    val raw = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = expected(raw, topK = 20)
    val got = runC12(sf())
    assert(want.nonEmpty && got == want,
      s"sf0.001 mismatch:\n got  ${got.take(3)}\n want ${want.take(3)}")
  }
}
