package graft.queries

import graft.SparkSpec

/** t20's trainer pinned against a THIRD implementation (the
  * SemDedupRecountSpec pattern): a plain-Scala greedy BPE loop over a
  * planted corpus, with the same argmax tie-break (count desc, left asc,
  * right asc) and the same greedy left-to-right non-overlap rule.  The
  * corpus plants the one subtle case — an odd run of equal tokens, where
  * `(a,a)` over `a a a a a` must merge positions 1–2 and 3–4 and leave
  * the 5th — and a decoy document OUTSIDE the 5% id-sample that would
  * change the learned merges if the sample filter leaked. */
class BpeTrainSpec extends SparkSpec {

  /** Reference trainer: greedy left-to-right merges, word granularity. */
  private def referenceTrain(docs: Seq[Seq[String]], rounds: Int): Seq[(Int, String, String, Long)] = {
    var cur = docs
    (1 to rounds).flatMap { k =>
      val counts = cur.flatMap(d => d.zip(d.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) None
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        cur = cur.map { d =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < d.length) {
            if (i + 1 < d.length && d(i) == l && d(i + 1) == r) { out += (l + r); i += 2 }
            else { out += d(i); i += 1 }
          }
          out.toList
        }
        Some((k, l, r, c))
      }
    }
  }

  test("learned merge table == plain-Scala greedy BPE on a planted corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-train").toString
    // sampled docs: doc_id % 20 == 0.  Doc 40 plants the odd equal-token
    // run; doc 60 re-uses a merged token as the LEFT side of a later
    // merge (merge-of-merge).
    val sampled = Seq(
      0L -> "the quick fox jumps over the quick fox again and again",
      20L -> "the quick fox sleeps while the quick fox runs",
      40L -> "ha ha ha ha ha boom boom boom",
      60L -> "the quick fox the quick fox the quick fox",
      80L -> "over and over and over and out")
    // decoy OUTSIDE the sample: would dominate every merge if included
    val decoy = Seq(7L -> ("zz yy " * 40).trim)
    val rows = (sampled ++ decoy).map { case (id, text) =>
      (id, text, "en", "s0", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expected = referenceTrain(
      sampled.map(_._2.split("\\s+").toSeq), rounds = 8)
    val got = TextOps.t20BpeTrain.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"merge tables diverge:\n got=$got\n want=$expected")
    // the decoy pair must not have been learned (sample filter held)
    assert(!got.exists(m => m._2.contains("zz") || m._3.contains("yy")),
      s"decoy document leaked into the training sample: $got")

    // ---- t21: the application loop round-trips the trainer's final state.
    // Re-encoding the SAMPLE with the learned rule list must land exactly
    // on the trainer's final occurrence table (the trainer applied those
    // same rules incrementally as it learned them).
    val (bests, finalAdj) = TextOps.withBpeConstructionConfs(spark) {
      TextOps.bpeTrainLoop(spark, dir)
    }
    val reApplied = TextOps.withBpeConstructionConfs(spark) {
      TextOps.bpeApplyMerges(spark,
        TextOps.bpeInitialAdjacency(spark, TextOps.bpeSampleOcc(spark, dir)), bests)
    }
    def occSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.select("doc_id", "rn", "tok").collect()
        .map(r => (r.getLong(0), r.getInt(1) + ":" + r.getString(2))).toSet
    assert(occSet(reApplied) == occSet(finalAdj),
      "apply(t20 merges) does not round-trip the trainer's final occurrence table")

    // ---- t21: full-corpus encode == plain-Scala reference application.
    // The decoy doc (outside the training sample) IS encoded — rules
    // just never match it — so the reference applies the same rule list
    // to every document, greedy left-to-right, rank order.
    def referenceApply(doc: Seq[String]): Seq[String] =
      expected.foldLeft(doc) { case (d, (_, l, r, _)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == l && d(i + 1) == r) { out += (l + r); i += 2 }
          else { out += d(i); i += 1 }
        }
        out.toList
      }
    val allDocs = sampled ++ decoy
    val wantBefore = allDocs.map(_._2.split("\\s+").length.toLong).sum
    val wantAfter = allDocs.map(d => referenceApply(d._2.split("\\s+").toSeq).length.toLong).sum
    // BOTH application paths — the one-pass native encoder (the default)
    // and the declarative K-window-pass oracle reference — must agree
    // with the plain-Scala reference AND with each other, byte for byte.
    // The planted corpus covers the two subtle cases: doc 40's odd
    // equal-token run (greedy alternation) and doc 60's merge-of-merge.
    val byMode = Seq("onepass", "passes").map { mode =>
      spark.conf.set("spark.graft.bpe.apply", mode)
      try mode -> TextOps.t21BpeApply.fn(spark, dir).collect()
      finally spark.conf.unset("spark.graft.bpe.apply")
    }.toMap
    byMode.foreach { case (mode, t21) =>
      assert(t21.length == 1 && t21.head.getAs[String]("source") == "s0", s"mode=$mode")
      assert(t21.head.getAs[Long]("n_docs") == allDocs.length.toLong, s"mode=$mode")
      assert(t21.head.getAs[Long]("tokens_before") == wantBefore,
        s"mode=$mode: tokens_before ${t21.head.getAs[Long]("tokens_before")} != $wantBefore")
      assert(t21.head.getAs[Long]("tokens_after") == wantAfter,
        s"mode=$mode: tokens_after ${t21.head.getAs[Long]("tokens_after")} != $wantAfter")
      assert(t21.head.getAs[Long]("merges_applied") == wantBefore - wantAfter, s"mode=$mode")
      assert(t21.head.getAs[Long]("compression_bp") == wantAfter * 10000 / wantBefore,
        s"mode=$mode")
    }
    assert(byMode("onepass").map(_.toSeq).toSeq == byMode("passes").map(_.toSeq).toSeq,
      "onepass and passes encoders disagree")
    // default is the one-pass path (the round-9 flip): an unset conf must
    // produce the same rows the explicit onepass run did
    val dflt = TextOps.t21BpeApply.fn(spark, dir).collect()
    assert(dflt.map(_.toSeq).toSeq == byMode("onepass").map(_.toSeq).toSeq,
      "default path is not the one-pass encoder")
    // loud rejection of an unknown mode
    spark.conf.set("spark.graft.bpe.apply", "bogus")
    try {
      val e = intercept[IllegalArgumentException] {
        TextOps.t21BpeApply.fn(spark, dir).collect()
      }
      assert(e.getMessage.contains("spark.graft.bpe.apply"))
    } finally spark.conf.unset("spark.graft.bpe.apply")
  }

  test("spark.graft.bpe.cache: t20+t21 share one memoized trainer; results unchanged") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-cache").toString
    Seq((0L, "a b a b a b c", "en", "s0", 13L), (20L, "a b a b x y", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def rows(name: String): Seq[Seq[Any]] =
      graft.SparkEntry.queries(name)(spark, dir).collect().map(_.toSeq).toSeq
    val isolated = Seq("t20_bpe_train", "t21_bpe_apply").map(n => n -> rows(n)).toMap
    spark.conf.set("spark.graft.bpe.cache", "true")
    try {
      TextOps.clearBpeCache()
      val cached = Seq("t20_bpe_train", "t21_bpe_apply").map(n => n -> rows(n)).toMap
      assert(TextOps.bpeTrainMemo.size == 1,
        s"expected ONE shared trainer memo entry, got ${TextOps.bpeTrainMemo.size}")
      assert(cached == isolated, "memoized trainer changed t20/t21 results")
    } finally {
      spark.conf.unset("spark.graft.bpe.cache")
      TextOps.clearBpeCache()
    }
  }

  test("graft_bpe_apply kernel == plain-Scala greedy reference on 300 seeded random cases") {
    // Deterministic sweep (seed 42) over adversarial small alphabets:
    // tokens drawn from {a, b, ab, c, ca} make rule outputs collide with
    // existing tokens (merge "a"+"b" yields the real token "ab"), which
    // is exactly where a wrong greedy/cascade rule would diverge.  All
    // 300 cases evaluate in ONE DataFrame pass.
    val s = spark
    import s.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    def referenceApply(doc: Seq[String], rules: Seq[(String, String)]): Seq[String] =
      rules.foldLeft(doc) { case (d, (l, r)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < d.length) {
          if (i + 1 < d.length && d(i) == l && d(i + 1) == r) { out += (l + r); i += 2 }
          else { out += d(i); i += 1 }
        }
        out.toList
      }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "c", "ca")
    val cases = (0 until 300).map { id =>
      val toks = Seq.fill(rnd.nextInt(21))(alphabet(rnd.nextInt(alphabet.length)))
      val rules = Seq.fill(rnd.nextInt(5))(
        (alphabet(rnd.nextInt(alphabet.length)), alphabet(rnd.nextInt(alphabet.length))))
      (id, toks, rules)
    }
    val got = cases.toDF("id", "toks", "ms")
      .selectExpr("id", "graft_bpe_apply(toks, ms) AS out")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    cases.foreach { case (id, toks, rules) =>
      val want = referenceApply(toks, rules)
      assert(got(id) == want,
        s"case $id: toks=$toks rules=$rules\n kernel=${got(id)}\n ref=$want")
    }
  }

  test("graft_bpe_apply kernel: greedy alternation, merge-of-merge, rule order, empty rules") {
    val s = spark
    import s.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    def apply(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
      val df = Seq((toks, merges)).toDF("toks", "ms")
        .selectExpr("graft_bpe_apply(toks, ms) AS out")
      df.collect().head.getSeq[String](0)
    }
    // odd equal-token run: alternate merges, 5th survives
    assert(apply(Seq("a", "a", "a", "a", "a"), Seq(("a", "a"))) == Seq("aa", "aa", "a"))
    // a merged token must NOT cascade within the same rule's pass
    assert(apply(Seq("x", "x", "y"), Seq(("x", "y"))) == Seq("x", "xy"))
    // merge-of-merge across rules, rank order respected
    assert(apply(Seq("the", "quick", "fox"), Seq(("the", "quick"), ("thequick", "fox")))
      == Seq("thequickfox"))
    // reversed rank order must NOT find the second merge
    assert(apply(Seq("the", "quick", "fox"), Seq(("thequick", "fox"), ("the", "quick")))
      == Seq("thequick", "fox"))
    // no rules / no matches / single token are identity
    assert(apply(Seq("a", "b"), Seq.empty) == Seq("a", "b"))
    assert(apply(Seq("a", "b"), Seq(("z", "z"))) == Seq("a", "b"))
    assert(apply(Seq("a"), Seq(("a", "a"))) == Seq("a"))
  }

  test("t22 fertility: tokens == t21's tokens_after per source; bp recounts from its own sums") {
    // both queries run the SAME one-pass encoder over the SAME trained
    // merges, so the per-source encoded-token totals must be identical —
    // and fertility_bp must be exactly chars·10⁴ div tokens
    val dir = sf()
    spark.conf.set("spark.graft.bpe.cache", "true")
    try {
      val t21 = TextOps.t21BpeApply.fn(spark, dir).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("tokens_after")).toMap
      val t22 = TextOps.t22BpeFertility.fn(spark, dir).collect()
      assert(t22.nonEmpty)
      for (r <- t22) {
        val src = r.getString(0)
        val chars = r.getAs[Long]("chars")
        val tokens = r.getAs[Long]("tokens")
        // name the degenerate branch FIRST: getAs[Long] on a NULL
        // fertility_bp would silently unbox to 0 and the recount would
        // die with an unrelated /-by-zero instead of naming the source
        assert(tokens > 0, s"$src: zero encoded tokens (fertility_bp is " +
          s"the nullif-guarded NULL branch) — degenerate fixture")
        assert(!r.isNullAt(r.fieldIndex("fertility_bp")), s"$src: null bp at tokens=$tokens")
        val bp = r.getAs[Long]("fertility_bp")
        assert(tokens == t21(src), s"$src: t22 tokens $tokens != t21 ${t21(src)}")
        assert(bp == chars * 10000L / tokens, s"$src: bp recount")
        // sanity: ≥ 1 char per token, and bounded by the longest doc
        assert(bp >= 10000L, s"$src: fertility below 1 char/token: $bp")
      }
    } finally {
      spark.conf.unset("spark.graft.bpe.cache")
      TextOps.clearBpeCache()
    }
  }
}
