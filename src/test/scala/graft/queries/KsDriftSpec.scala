package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of a12's integer KS statistic, pinned on PLANTED
  * distributions with hand-derivable answers (the oracle proves
  * cross-engine agreement; this proves the statistic itself):
  *  - a complete support shift (period values disjoint) must score the
  *    maximum D = 1 → ks_bp = 10000;
  *  - identical per-period value multisets must score D = 0 → ks_bp = 0,
  *    no matter the (equal) counts;
  *  - a planted half-mass shift must score exactly its closed-form
  *    D·n₀·n₁. */
class KsDriftSpec extends SparkSpec {

  /** Events fixture: value distributions chosen per type; ts places rows
    * in the first/second calendar half (midpoint = (min+max)/2 of the
    * whole table). */
  private def writeEvents(dir: String, rows: Seq[(String, Double, String)]): Unit = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((typ, v, iso), i) =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.parse(iso)),
        i.toLong % 97, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private val Early = "2024-01-01T00:00:00Z" // before the midpoint
  private val Late = "2024-01-05T00:00:00Z"  // after it (max ts anchor)

  test("disjoint supports score D=1 (10000 bp); identical multisets score 0") {
    val dir = java.nio.file.Files.createTempDirectory("ks-drift").toString
    val shifted = // period 0: values 1..10; period 1: values 11..20
      (1 to 10).map(v => ("shift", v.toDouble, Early)) ++
        (11 to 20).map(v => ("shift", v.toDouble, Late))
    val same = // identical multiset both halves
      (1 to 8).flatMap(v => Seq(("same", v.toDouble, Early), ("same", v.toDouble, Late)))
    writeEvents(dir, shifted ++ same)

    val got = Analytics.a12DistributionDrift.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // shift: n0=10, n1=10; at v=10 c0=10, c1=0 → |10·10 − 0·10| = 100 = n0·n1
    assert(got("shift") == ((10L, 10L, 100L, 10000L)), s"got ${got("shift")}")
    // same: counts track exactly at every value → 0
    assert(got("same") == ((8L, 8L, 0L, 0L)), s"got ${got("same")}")
  }

  test("a planted half-mass shift scores its closed-form D·n0·n1 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ks-drift2").toString
    // period 0: 4×{1} + 4×{2}; period 1: 4×{2} + 4×{3}.
    // c0/c1 walk: v=1 → (4,0); v=2 → (8,4); v=3 → (8,8); n0=n1=8.
    // max |c0·n1 − c1·n0| at v=1: |32−0| = 32 → ks_bp = 32·10⁴ div 64 = 5000.
    val rows =
      Seq.fill(4)(("half", 1.0, Early)) ++ Seq.fill(4)(("half", 2.0, Early)) ++
        Seq.fill(4)(("half", 2.0, Late)) ++ Seq.fill(4)(("half", 3.0, Late))
    writeEvents(dir, rows)
    val got = Analytics.a12DistributionDrift.fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got("half") == ((32L, 5000L)), s"got ${got("half")}")
  }
}
