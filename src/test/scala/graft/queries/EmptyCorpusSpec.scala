package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** Empty-input robustness: every declared query must EXECUTE (not just
  * plan) against a dataset directory whose tables carry the production
  * schemas but zero rows, without throwing.
  *
  * This is the degenerate case every 100 TB pipeline hits in practice —
  * a new date partition before data lands, a filter that eliminates a
  * source, a tenant with no documents yet — and the failure mode it
  * guards against is real: aggregates over empty inputs produce nulls
  * that downstream arithmetic must tolerate, kernels (`mapPartitions`,
  * `flatMapGroups`) see empty iterators, broadcast sides come up empty,
  * and plan-statistics switches (d2) read zero sizeInBytes.  Global
  * aggregates legitimately return their null-filled single row;
  * everything else should return zero rows.  No query may crash.
  */
class EmptyCorpusSpec extends SparkSpec {

  /** sf0.001 schemas, zero rows, written once per suite run; registered
    * for recursive deletion at JVM exit. */
  private lazy val emptyDir: String = {
    val path = java.nio.file.Files.createTempDirectory("graft-empty")
    val dir = path.toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(path))
        Files.walk(path).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p): Unit)
    }))
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, sf(), t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events goes through the dtype-adaptive loader so the empty copy
    // lands in the normalized logical schema (ts: TimestampType) and reads
    // back through the same adaptive path regardless of which physical
    // form the driver testdata ships.
    Tables.events(spark, sf()).limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query executes on an all-empty dataset without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, emptyDir).collect(): Unit
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }

  test("non-global queries return zero rows on an all-empty dataset") {
    // global aggregates produce their single null-filled row by SQL
    // semantics; every other query must be empty-in → empty-out.
    // A query that CRASHES here is a hard failure too — the no-crash
    // property belongs to the previous test, but silently skipping a
    // crashed query would let this test pass vacuously.
    val globalAgg = Set("a1_metrics", "a2_emoji_mood", "q21_funnel",
      "t7_rolling_fingerprint", "t9_distinctive_terms", "d1_dedup_exact",
      "d2_ngram_jaccard", "c1_corpus_curation", "t13_vocab_oov",
      "d13_banding_recall", "d15_embed_recall",
      // c13 composes three GLOBAL aggregates (one per model family), so
      // an empty corpus yields its three family rows with null metrics
      // and 'keep' verdicts — the DuckDB oracle replays the same SQL
      // semantics
      "c13_refresh_decision")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = try fn(spark, emptyDir).count() catch {
        case e: Throwable =>
          fail(s"$name crashed in the count pass (see the no-crash test): " +
            s"${e.getClass.getSimpleName} ${e.getMessage}")
      }
      if (!globalAgg.contains(name) && n > 0)
        fail(s"$name returned $n rows from an empty dataset")
    }
  }
}
