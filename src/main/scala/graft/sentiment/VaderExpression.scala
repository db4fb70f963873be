package graft.sentiment

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel with a static forwarder (Scala top-level objects emit static
  * mirror methods), so generated Java can call it directly. */
object VaderKernel {
  def compute(s: UTF8String): Float =
    if (s == null) 0.0f else Vader.compound(s.toString).toFloat
}

/** Tier-2 sentiment scorer (SURVEY.md §7.3): a native Catalyst
  * `UnaryExpression` whose codegen emits a direct static call into
  * [[VaderKernel]].  Unlike the tier-1 Scala UDF this has no
  * encoder/serializer boundary and no closure dispatch — the whole
  * enrichment chain stays inside one whole-stage-codegen span.
  *
  * Registered as SQL function `vader_compound` by [[GraftFunctions]];
  * `SentimentFunctions.sentimentScore` routes through it via
  * `call_function`, falling back to the UDF only when no session has
  * registered the function (e.g. bare Column construction in tests).
  */
case class VaderCompound(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = FloatType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vader_compound requires a string argument, got ${child.dataType}")
  override def prettyName: String = "vader_compound"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    VaderKernel.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        float ${ev.value} = graft.sentiment.VaderKernel.compute(
          ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VaderCompound =
    copy(child = newChild)
}

/** Session-level registration of graft's native SQL functions. */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vader_compound", exprs => VaderCompound(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => graft.functions.ArrayDotProduct(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum",
      exprs => graft.functions.VecSumAgg(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest",
      exprs => graft.functions.NearestCentroid(exprs.head, exprs(1), exprs(2),
        exprs(3)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_fp",
      exprs => graft.functions.RollingFingerprint(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk",
      exprs => graft.functions.TopKAgg(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigrams",
      exprs => graft.functions.ArrayBigrams(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_charfold",
      exprs => graft.functions.CharFold(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_apply",
      exprs => graft.functions.BpeApplyMerges(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_band_values",
      exprs => graft.functions.BandValues(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_band_hashes",
      exprs => graft.functions.BandHashes(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv",
      exprs => graft.functions.KmvDistinct(exprs.head, exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv_mins",
      exprs => graft.functions.KmvMins(exprs.head, exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => graft.functions.CountMinAgg(exprs.head, exprs(1)), "scala_udf")
    // Spark's own runtime-filter bloom kernel (BloomFilterAggregate /
    // BloomFilterMightContain — the machinery behind InjectRuntimeFilter),
    // surfaced as callable functions so queries can build SEMANTIC bloom
    // pre-filters (c10 decontamination) lazily, with zero driver-side
    // collection: the filter is built by an aggregate inside the plan and
    // shipped to tasks as a scalar-subquery result.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)), "scala_udf")
  }
}
