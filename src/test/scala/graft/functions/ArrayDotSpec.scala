package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + parity tests for the native `graft_dot` expression: the codegen
  * path must be bit-identical to the Catalyst higher-order-function fold it
  * replaced (the ANN oracle hashes depend on this). */
class ArrayDotSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("graft_dot ≡ aggregate(zip_with) fold, bit-identical over random vectors") {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rng.nextDouble() * 2 - 1),
      Array.fill(64)(rng.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("native", call_function("graft_dot", col("a"), col("b")))
      .withColumn("hof", hofDot(col("a"), col("b")))
    val mismatch = df.filter(col("native") =!= col("hof")).count()
    assert(mismatch == 0, s"$mismatch rows diverged from the HOF fold")
    // and values are genuinely nonzero (the comparison isn't vacuous)
    assert(df.filter(abs(col("native")) > 1e-6).count() > 100)
  }

  test("null propagation and empty arrays") {
    import spark.implicits._
    graft.sentiment.GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0)), None: Option[Array[Double]]),
      (None: Option[Array[Double]], Some(Array(1.0, 2.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double])),
      (Some(Array(1.5, 2.0)), Some(Array(2.0, 0.5))))
      .toDF("a", "b")
      .withColumn("d", call_function("graft_dot", col("a"), col("b")))
    val out = df.select("d").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).isEmpty && out(1).isEmpty) // null input → null output
    assert(out(2).contains(0.0))             // empty arrays → 0.0
    assert(out(3).contains(4.0))             // 1.5*2 + 2*0.5
  }

  test("GraftExtensions injects both native functions at session build (no manual register)") {
    // SparkSpec builds its session withExtensions(new GraftExtensions) —
    // SQL must resolve graft's functions without GraftFunctions.register
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    val v = spark.sql("SELECT vader_compound('i love this') AS v").head().getFloat(0)
    assert(v > 0.05f)
  }

  test("HOF-fold null semantics: ragged lengths and null elements yield NULL") {
    import spark.implicits._
    // ragged arrays: zip_with null-pads → fold poisons → NULL; the native
    // kernel must agree (it is injected session-wide, not just ANN-internal)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0, 10.0)))
      .toDF("a", "b")
      .withColumn("native", call_function("graft_dot", col("a"), col("b")))
      .withColumn("hof", hofDot(col("a"), col("b")))
    val r = df.select("native", "hof").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // null ELEMENT likewise
    val r2 = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(2.0D, 3.0D)) AS d")
      .head()
    assert(r2.isNullAt(0))
  }
}
