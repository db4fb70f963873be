package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the local[32] scaling-pass pathology (round-14
  * verdict #2): replays graft.Bench's scaling suite shape — one wide
  * session, every registered query in registry order, Bench's exact
  * clearCaches() between runs — printing per-query wall time LIVE so a
  * pathological query can be thread-dumped while it runs.
  *
  *   SPARK_GRAFT_CPUS=32 java -cp ... graft.tools.WideProbe \
  *     /root/testdata/sf0.1 [stopAfterQueryName]
  */
object WideProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val stopAfter = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // spark.file.transferTo=false: the mmap-based transferTo path
      // serializes wide single-JVM shuffles (SCALING.md "local[32]
      // pathology"; full rationale at Bench.runSuite)
      .config("spark.file.transferTo", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").count(): Unit }
      catch { case _: Throwable => () }
    }
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      graft.queries.TextOps.clearBpeCache()
      graft.queries.Similarity.clearEmbedCache()
      graft.queries.Dedup.clearDupGraphCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      System.err.println(s"[wideprobe] START $name")
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(): Unit }
      catch { case e: Throwable =>
        System.err.println(s"[wideprobe] $name FAILED: ${e.getClass.getSimpleName}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      clearCaches()
      System.err.println(f"[wideprobe] DONE  $name%-28s ${t}%8.2f s")
      if (stopAfter.contains(name)) { spark.stop(); sys.exit(0) }
    }
    spark.stop()
  }
}
