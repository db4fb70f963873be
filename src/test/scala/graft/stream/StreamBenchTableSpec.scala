package graft.stream

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Gates the committed SCALING.md live-stage throughput table (produced
  * by `graft.StreamBench` — the DedupScalingSpec discipline applied to
  * the streaming evidence): every live stage must have a row, every
  * measured rate must parse, and every rate must clear the reference's
  * ~3.3 rec/s file-sink envelope by at least 100× (the weakest stage,
  * T14's live-verified near-dup, measures ~350×; most clear by 4–5
  * orders of magnitude).  Wall-clock itself is asserted only in the
  * harness run — this spec pins the committed EVIDENCE so it cannot
  * silently rot or drift from the claims in the stream modules'
  * scaladocs. */
class StreamBenchTableSpec extends AnyFunSuite {

  private lazy val lines: Seq[String] = {
    val p = java.nio.file.Paths.get("SCALING.md")
    assert(java.nio.file.Files.exists(p),
      "SCALING.md missing — run: sbt \"runMain graft.StreamBench\"")
    java.nio.file.Files.readAllLines(p).asScala.toSeq
  }

  private val stages = Seq("T10", "T10b", "T12", "T13", "T15", "T6",
    "T16", "T17", "T18", "T11", "T19", "T20", "T14", "T22")

  private val Row = raw"\|\s*(T\S+)[^|]*\|\s*([\d,]+)[^|]*\|.*".r

  private lazy val section: Seq[String] = {
    val start = lines.indexWhere(_.startsWith("## Live-stage throughput"))
    assert(start >= 0, "live-stage throughput section missing from SCALING.md")
    val rest = lines.drop(start + 1)
    val end = rest.indexWhere(_.startsWith("## "))
    if (end < 0) rest else rest.take(end)
  }

  private lazy val rates: Map[String, Long] = section.collect {
    case Row(tag, n) => tag -> n.replace(",", "").toLong
  }.toMap

  test("every live stage has a measured row") {
    // exact tag match (the row tag is "T<n>" or "T<n>b"), not a prefix —
    // a missing T10 row must not be satisfied by T10b
    val tags = rates.keySet
    for (s <- stages)
      assert(tags.contains(s), s"stage $s missing: $tags")
    assert(rates.size == stages.size, s"unexpected rows: $rates")
  }

  test("every stage clears the reference envelope by >= 100x") {
    val referenceEnvelope = 3.3
    for ((tag, r) <- rates)
      assert(r >= 100 * referenceEnvelope,
        s"$tag measured $r rows/s — below 100x the reference's 3.3 rec/s")
  }

  test("the method and the undercount caveat are documented with the numbers") {
    assert(section.exists(_.contains("lower bound")), "undercount caveat missing")
    assert(section.exists(_.contains("graft.StreamBench")), "regeneration recipe missing")
  }
}
