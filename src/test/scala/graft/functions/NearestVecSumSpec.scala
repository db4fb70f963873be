package graft.functions

import graft.SparkSpec
import graft.sentiment.GraftFunctions
import org.apache.spark.sql.functions._

/** Unit pins for the two r17 assignment-path kernels.  The query-level
  * oracles prove them in situ over every consumer (143/143 after the
  * rewrite); these pin the LOCAL contracts the rewrites rely on —
  * min_by-equivalence including the id tie-break, packed-row/empty-set
  * semantics, and exact order-free summation. */
class NearestVecSumSpec extends SparkSpec {

  test("graft_nearest ≡ crossJoin+min_by argmin, including the (d, id) tie-break") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // deterministic small-integer grid vectors (the quantized-relation
    // regime the kernel serves): 40 points × 7 centroids, dim 5, with
    // engineered exact-distance ties (duplicate centroids under
    // different ids) so the id tie-break is exercised, not just assumed
    val dim = 5
    def vec(seed: Long): Seq[Double] =
      (0 until dim).map(i => ((seed * 31 + i * 17) % 13 - 6).toDouble)
    val points = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "qv")
    val cents = ((0 until 5).map(j => (j, vec(j * 3L))) ++
      Seq((5, vec(6L)), (6, vec(6L)))) // ids 5,6 duplicate → tie on d
      .toDF("list_id", "cent")
      .select(col("list_id"), col("cent"),
        call_function("graft_dot", col("cent"), col("cent")).as("cc"))
    val pts = points
      .withColumn("vv", call_function("graft_dot", col("qv"), col("qv")))
    // reference: the old aggregate form
    val ref = pts.crossJoin(broadcast(cents))
      .withColumn("d", col("vv") - lit(2) *
        call_function("graft_dot", col("qv"), col("cent")) + col("cc"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("list_id"), col("d")),
        struct(col("d"), col("list_id"))).as("best"))
      .select(col("vec_id"), col("best.list_id").as("id"), col("best.d").as("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    // packed map-side form (the exact shape the query builders use)
    val packed = cents.agg(array_sort(collect_list(struct(
        col("list_id").cast("int").as("i"), col("cent").as("cent"),
        col("cc").as("cc")))).as("cs"))
      .select(
        transform(col("cs"), c => c.getField("i")).as("ids"),
        flatten(transform(col("cs"), c => c.getField("cent"))).as("flat"),
        transform(col("cs"), c => c.getField("cc")).as("ccs"))
    val got = pts.crossJoin(broadcast(packed))
      .withColumn("best", call_function("graft_nearest",
        col("qv"), col("ids"), col("flat"), col("ccs")))
      .select(col("vec_id"), col("best.id").as("id"), col("best.d").as("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == ref.toSeq, s"argmin diverged:\n got=${got.toSeq}\n ref=${ref.toSeq}")
    // the duplicate-centroid tie must resolve to the LOWER id (5, not 6)
    assert(!got.exists(_._2 == 6), "tie-break picked the higher id")
  }

  test("graft_nearest over an empty centroid set is null (→ the builders' zero-rows semantics)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq(Tuple1(Seq(1.0, 2.0))).toDF("qv")
      .select(call_function("graft_nearest", col("qv"),
        expr("CAST(array() AS ARRAY<INT>)"),
        expr("CAST(array() AS ARRAY<DOUBLE>)"),
        expr("CAST(array() AS ARRAY<DOUBLE>)")).as("best"))
      .head()
    assert(r.isNullAt(0), "empty centroid set must yield null, not a row")
  }

  test("graft_vec_sum ≡ per-position posexplode sums; partition-invariant; ragged groups fail loudly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = (0L until 100L)
      .map(i => (i % 7, Seq(i.toDouble, (i % 11).toDouble, -i.toDouble)))
      .toDF("k", "v")
    val ref = rows.select(col("k"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("k"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("k"), transform(col("ps"), p => p.getField("s")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    // repartition(7): the aggregate must merge partial buffers across
    // partitions — exact integer sums make the merge order immaterial
    val got = rows.repartition(7).groupBy(col("k"))
      .agg(call_function("graft_vec_sum", col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(got.toSeq == ref.toSeq, s"vec_sum diverged:\n got=${got.toSeq}\n ref=${ref.toSeq}")
    // ragged lengths in one group: correct-by-crash, never a mis-sum
    val ragged = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0))).toDF("k", "v")
      .groupBy(col("k")).agg(call_function("graft_vec_sum", col("v")).as("sv"))
    val e = intercept[Exception] { ragged.collect() }
    assert(e.getMessage != null)
  }
}
