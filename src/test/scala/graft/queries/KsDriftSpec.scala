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

  test("a13 ≡ a12 when every integer value lands in its own bin (planted)") {
    // values 1..20 over a 256-bin grid → one value per bin → the binned
    // walk visits every exact prefix position → identical statistic
    val dir = java.nio.file.Files.createTempDirectory("ks-bins").toString
    val rows = (1 to 10).map(v => ("shift", v.toDouble, Early)) ++
      (11 to 20).map(v => ("shift", v.toDouble, Late))
    writeEvents(dir, rows)
    val a12 = Analytics.a12DistributionDrift.fn(spark, dir).collect().map(_.toString)
    val a13 = Analytics.a13BinnedDrift.fn(spark, dir).collect().map(_.toString)
    assert(a13.sameElements(a12), s"a13=$a13 a12=$a12")
  }

  test("a13 on the real corpus: Scala reference match, binned ≤ exact ≤ binned + in-bin bound") {
    // Independent third implementation of the binned statistic, plus the
    // two inequalities that make 256 bins a SAFE substitute for the
    // exact walk: every bin boundary is one of the exact walk's own
    // prefix positions (so D_binned ≤ D_exact), and within a bin the
    // running statistic can drift from the boundary value by at most
    // the bin's own one-period mass (so D_exact ≤ D_binned + max bin
    // mass) — the resolution knob a deployment sizes DriftBins by.
    val raw = graft.tables.Tables.events(spark, sf()).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(raw.nonEmpty)
    val minmax = raw.map(_._3).min + raw.map(_._3).max
    val fmin = math.floor(raw.map(_._2).min).toLong
    val fmax = math.floor(raw.map(_._2).max).toLong
    def bin(v: Double) = (math.floor(v).toLong - fmin) * 256L / (fmax - fmin + 1)
    val ref = raw.groupBy(_._1).map { case (t, rows) =>
      val d = rows.groupBy(r => bin(r._2)).toSeq.sortBy(_._1).map { case (b, rs) =>
        (b, rs.count(r => r._3 * 2 <= minmax).toLong, rs.count(r => r._3 * 2 > minmax).toLong)
      }
      val n0 = d.map(_._2).sum; val n1 = d.map(_._3).sum
      var c0 = 0L; var c1 = 0L; var ks = 0L; var maxBinMass = 0L
      d.foreach { case (_, d0, d1) =>
        c0 += d0; c1 += d1
        ks = math.max(ks, math.abs(c0 * n1 - c1 * n0))
        maxBinMass = math.max(maxBinMass, math.max(d0 * n1, d1 * n0))
      }
      t -> ((n0, n1, ks, maxBinMass))
    }
    val a13 = Analytics.a13BinnedDrift.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val a12 = Analytics.a12DistributionDrift.fn(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a13.keySet == a12.keySet)
    val expectedTypes = ref.filter { case (_, (n0, n1, _, _)) => n0 > 0 && n1 > 0 }
    assert(a13.keySet == expectedTypes.keySet)
    expectedTypes.foreach { case (t, (n0, n1, ks, bound)) =>
      val (g0, g1, gks, gbp) = a13(t)
      assert((g0, g1, gks) == ((n0, n1, ks)), s"$t: a13 ${(g0, g1, gks)} != ref ${(n0, n1, ks)}")
      assert(gbp == ks * 10000L / (n0 * n1), s"$t: ks_bp mismatch")
      assert(gks <= a12(t), s"$t: binned KS $gks exceeds exact ${a12(t)}")
      assert(a12(t) <= gks + bound,
        s"$t: exact ${a12(t)} exceeds binned $gks + in-bin bound $bound")
    }
  }
}
