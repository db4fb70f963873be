package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (lazy, local[4], UTC — matches the driver
  * harness config in Verify.scala). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf(name: String = "sf0.001"): String = s"/root/testdata/$name"

  /** Scaffold for checkpointed-restart tests: input/sink/checkpoint temp
    * dirs plus a JSON-lines batch writer — the one shape every streaming
    * operator's restart-survival spec shares (a fix to the write
    * mechanics, e.g. atomic temp-then-rename drops, lands once here). */
  final case class RestartDirs(in: String, out: String, cp: String) {
    def writeBatch(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes): Unit
  }

  def restartDirs(prefix: String): RestartDirs = RestartDirs(
    java.nio.file.Files.createTempDirectory(s"$prefix-in").toString,
    java.nio.file.Files.createTempDirectory(s"$prefix-out").toString,
    java.nio.file.Files.createTempDirectory(s"$prefix-cp").toString)

  /** Run `body` under overridden refresh-decision thresholds, restoring
    * the session confs after — the forced-verdict scaffold every
    * serve-again spec shares (c16/s18/s19/s20/c17). */
  def withRefreshThresholds[A](st: Long, ben: Long)(body: => A): A = {
    spark.conf.set("spark.graft.refresh.minStalenessBp", st.toString)
    spark.conf.set("spark.graft.refresh.minBenefitBp", ben.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.refresh.minStalenessBp")
      spark.conf.unset("spark.graft.refresh.minBenefitBp")
    }
  }
}
