package graft.queries

/** Dev tool: measure the d5/d7 pair-kernel comparison count and wall time
  * on planted clustered corpora at n, 2n, 4n — the calibration data behind
  * D5ScalingSpec's curve assertions.
  * Run: `sbt "Test/runMain graft.queries.D5ScalingSweep"`. */
object D5ScalingSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("d5-scaling")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (n <- Seq(1000L, 2000L, 4000L)) {
      val corpus = spark.createDataset(PlantedClusters.corpus(n))
      val acc = spark.sparkContext.longAccumulator(s"d5-comparisons-$n")
      val t0 = System.nanoTime()
      val rows = Similarity.embeddingPairsOf(spark, corpus, blocks = 4,
        comparisons = Some(acc)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val allPairs = n * (n - 1) / 2
      println(f"n=$n%5d  pairsOut=$rows%7d  compares=${acc.value}%9d  " +
        f"allPairs=$allPairs%9d  frac=${acc.value.toDouble / allPairs}%.4f  wall=$secs%6.2f s")
    }
    spark.stop()
  }
}
