package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 verdict #2: the r14 correctness artifact silently omitted
  * s20 because the dump predated the commit.  The Verify dump now carries
  * a registry manifest (`queries.json`); this spec pins the manifest's
  * contract so the checker-side completeness gate can trust it:
  * it must parse as JSON, list exactly `SparkEntry.queries.keySet`
  * (sorted), and carry a count that matches. */
class VerifyManifestSpec extends AnyFunSuite {

  private def parse(json: String): (Int, Boolean, Seq[String]) = {
    // minimal parser for the writer's fixed shape — no JSON lib on the
    // main classpath, and a shape drift should fail THIS spec loudly
    val re = """\{"count":(\d+),"filtered":(true|false),"names":\[(.*)\]\}""".r
    json match {
      case re(c, f, names) =>
        val ns = if (names.isEmpty) Seq.empty[String]
          else names.split(",").toSeq.map { s =>
            assert(s.startsWith("\"") && s.endsWith("\""), s"unquoted name: $s")
            s.substring(1, s.length - 1)
          }
        (c.toInt, f.toBoolean, ns)
      case _ => fail(s"manifest shape drifted: $json")
    }
  }

  test("manifest lists exactly the registry, sorted, with a true count") {
    val (count, filtered, names) = parse(Verify.manifestJson(filtered = false))
    assert(!filtered)
    assert(count === names.size)
    assert(names === names.sorted)
    assert(names.toSet === SparkEntry.queries.keySet)
  }

  test("filtered flag survives the round trip") {
    val (_, filtered, _) = parse(Verify.manifestJson(filtered = true))
    assert(filtered)
  }

  test("query names stay manifest-safe (no quotes/commas/brackets)") {
    // the writer does not escape names — keep them trivially escapable
    val bad = SparkEntry.queries.keySet.filter(n =>
      n.exists(c => c == '"' || c == ',' || c == '[' || c == ']' ||
        c == '\\' || c < ' '))
    assert(bad.isEmpty, s"names needing escaping: $bad")
  }
}
