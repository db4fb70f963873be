package graft.queries

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** c15's five-stage composition recounted STAGE BY STAGE: each stage's
  * input comes from the already-oracled component relation (d6's labels,
  * c11's scored docs) or a plain-Scala replay of the shared convention
  * (fingerprints, split hash, md5 acceptance, packing cumsum), applied
  * one at a time in driver-side Scala — the composed query must produce
  * exactly the same rows.  This is the row-parity proof that composing
  * the stages into one dataflow changed the PLAN, not the pipeline. */
class CurationPipelineSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(docId: Long): String = {
    val h1 = md5hex(s"$docId:split").charAt(0)
    if (h1 < 'd') "train" else if (h1 < 'f') "valid" else "test"
  }

  test("c15 == the stages applied one at a time (sf0.001)") {
    val dir = sf()

    // stage inputs
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dropSet = graft.SparkEntry.queries("d6_dup_clusters")(spark, dir)
      .collect().filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    val scores = Curation.dsirScoredDocs(spark, dir)
      .select(col("doc_id"), col("score_bp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // stage 1+2: canonical dedup, then benchmark decontamination
    val withFp = docs.map { case (id, src, t) =>
      (id, src, t.trim.split("\\s+").length.toLong,
        md5hex(t.toLowerCase.replaceAll("\\s+", " ")))
    }
    val benchFps = withFp.filter(_._1 % 13 == 0).map(_._4).toSet
    val deduped = withFp.filter(d => !dropSet.contains(d._1))
    val decon = deduped.filter(d => !benchFps.contains(d._4))

    // stage 3: selection floor at the raw pool's mean score
    val floorBp = Math.floorDiv(scores.values.sum, scores.size.toLong)
    val selected = decon.filter { case (id, src, _, _) =>
      src == Curation.DsirTarget || scores.get(id).exists(_ >= floorBp)
    }.map { case (id, src, n, _) => (id, src, n) }

    // stage 4: c4's rates over the selected pool + c5's md5 acceptance
    val avail = selected.groupBy(_._2).map { case (s, ds) => s -> ds.map(_._3).sum }
    val budget = avail.values.sum / 2
    val target = budget / avail.size
    val rates = avail.map { case (s, a) =>
      s -> math.min(Math.floorDiv(target * 10000L, a), 10000L) }
    def accepted(id: Long, rate: Long): Boolean =
      rate == 10000L || {
        val thr = "%04x".format(rate * 65536L / 10000L)
        md5hex(s"$id:c15mix").substring(0, 4) < thr
      }
    val mixed = selected.filter { case (id, src, _) => accepted(id, rates(src)) }

    // stage 5: c3's packing accounting per (split, source)
    val want = mixed
      .map { case (id, src, n) => (splitOf(id), src, id, n) }
      .groupBy { case (sp, src, _, _) => (sp, src) }
      .map { case ((sp, src), rows) =>
        val ordered = rows.toSeq.sortBy(_._3)
        var cum = 0L
        var straddlers = 0L
        for ((_, _, _, n) <- ordered) {
          val before = cum; cum += n
          if (Math.floorDiv(before, 2048L) < Math.floorDiv(cum - 1, 2048L))
            straddlers += 1
        }
        val total = ordered.map(_._4).sum
        (sp, src, ordered.size.toLong, total,
          Math.floorDiv(total + 2047L, 2048L), straddlers, rates(src))
      }.toSeq.sortBy(r => (r._1, r._2))

    val got = Curation.c15CurationPipeline.fn(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

    assert(got == want,
      s"stage-by-stage mismatch:\n got  ${got.mkString("\n      ")}\n" +
        s" want ${want.mkString("\n      ")}")
    // the composition must be non-degenerate on this corpus: every stage
    // drops something and more than the target source survives
    assert(dropSet.nonEmpty, "dedup stage inert")
    assert(deduped.size > decon.size, "decontamination stage inert")
    assert(decon.size > selected.size, "selection stage inert")
    assert(selected.size > mixed.size, "mixing stage inert")
    assert(mixed.map(_._2).distinct.size > 1, "only the target source survived")
  }
}
