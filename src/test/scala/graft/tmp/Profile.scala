package graft.tmp
import org.apache.spark.sql.SparkSession
object Profile extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.1"
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROF $name rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
  }
  // warmup
  time("warmup_count")(graft.tables.Tables.documents(spark, dir).count())
  time("d1_run1")(graft.queries.TextOps.d1DedupExact.fn(spark, dir).count())
  time("d1_run2")(graft.queries.TextOps.d1DedupExact.fn(spark, dir).count())
  time("t4_run1")(graft.queries.TextOps.t4Fingerprint.fn(spark, dir).count())
  time("d2_run1")(graft.queries.TextOps.d2NgramJaccard.fn(spark, dir).count())
  time("d2_run2")(graft.queries.TextOps.d2NgramJaccard.fn(spark, dir).count())
  spark.stop()
}
