package graft.sentiment

/** Dev tool: score every [[ProbeWords]] entry against the lexicon and
  * print the zero-scoring gaps plus coverage / sign-accuracy counts —
  * the input the round-4 lexicon extension block is authored from.
  * Run: `sbt "Test/runMain graft.sentiment.ProbeSweep"`. */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    def sweep(tag: String, ws: Seq[String], sign: Int): Seq[String] = {
      val zero = ws.filter(w => Vader.compound(w) == 0.0)
      val wrong = ws.filter { w =>
        val c = Vader.compound(w); c != 0.0 && math.signum(c) != sign
      }
      println(s"== $tag: ${ws.size} words, ${zero.size} zero, ${wrong.size} wrong-sign")
      println(s"-- $tag zero: ${zero.mkString(" ")}")
      if (wrong.nonEmpty) println(s"-- $tag WRONG SIGN: ${wrong.mkString(" ")}")
      zero
    }
    val zp = sweep("positive", ProbeWords.positive, 1)
    val zn = sweep("negative", ProbeWords.negative, -1)
    val n = ProbeWords.all.size
    val covered = n - zp.size - zn.size
    println(f"== total: $n words, covered $covered (${covered * 100.0 / n}%.1f%%)")
    val dups = ProbeWords.all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    if (dups.nonEmpty) println(s"== probe DUPLICATES: ${dups.mkString(" ")}")
  }
}
