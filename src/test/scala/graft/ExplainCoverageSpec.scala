package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** EXPLAIN.md is the committed plan-evidence surface — one `## <name>`
  * section with a fenced formatted plan per registered query.  Round 4
  * grew the registry after the plans were regenerated and the drift was
  * only caught by hand; this gate makes that impossible: the section set
  * must equal `SparkEntry.queries.keySet` exactly.  Regenerate with
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 --dump ALL --out EXPLAIN.md"
  * whenever a query is added, removed, or renamed. */
class ExplainCoverageSpec extends AnyFunSuite {

  test("EXPLAIN.md sections set-equal SparkEntry.queries") {
    val path = java.nio.file.Paths.get("EXPLAIN.md")
    assert(java.nio.file.Files.exists(path), "EXPLAIN.md missing from repo root")
    val sections = java.nio.file.Files.readAllLines(path).asScala
      .filter(_.startsWith("## ")).map(_.stripPrefix("## ").trim).toSeq
    val dupes = sections.groupBy(identity).collect { case (n, s) if s.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate EXPLAIN.md sections: ${dupes.mkString(", ")}")
    val have = sections.toSet
    val want = SparkEntry.queries.keySet
    val missing = want -- have
    val stale = have -- want
    assert(missing.isEmpty && stale.isEmpty,
      s"EXPLAIN.md drifted from the query registry — " +
        s"missing plans: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"stale sections: ${stale.toSeq.sorted.mkString(", ")}. " +
        "Regenerate: sbt \"runMain graft.PlanAudit /root/testdata/sf0.01 --dump ALL --out EXPLAIN.md\"")
  }

  test("every EXPLAIN.md section carries a non-empty fenced physical plan") {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("EXPLAIN.md")).asScala.toSeq
    // split into (name, body) by ## headers
    val idx = lines.zipWithIndex.collect { case (l, i) if l.startsWith("## ") => i }
    val bounds = idx.zip(idx.drop(1) :+ lines.size)
    bounds.foreach { case (start, end) =>
      val name = lines(start).stripPrefix("## ").trim
      val body = lines.slice(start + 1, end)
      assert(body.exists(_.contains("== Physical Plan ==")),
        s"section $name has no formatted physical plan")
    }
  }
}
