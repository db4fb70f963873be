package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension hook registering graft's native Catalyst functions at
  * session build — the SURVEY §7.3 extension mechanism, usable two ways:
  *
  *   - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - programmatic: `SparkSession.builder().withExtensions(new GraftExtensions)`
  *     (the graft mains and the test harness do this)
  *
  * [[graft.sentiment.GraftFunctions.register]] remains as a per-session
  * fallback for sessions built without the hook (query fns call it
  * idempotently so bare construction keeps working anywhere).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vader_compound"),
      new ExpressionInfo(classOf[graft.sentiment.VaderCompound].getName, "vader_compound"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.sentiment.VaderCompound(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ArrayDotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[graft.functions.VecSumAgg].getName, "graft_vec_sum"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VecSumAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest"),
      new ExpressionInfo(classOf[graft.functions.NearestCentroid].getName, "graft_nearest"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NearestCentroid(exprs.head, exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[graft.functions.RollingFingerprint].getName, "graft_rolling_fp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RollingFingerprint(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "graft_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.TopKAgg(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bigrams"),
      new ExpressionInfo(classOf[graft.functions.ArrayBigrams].getName, "graft_bigrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ArrayBigrams(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_apply"),
      new ExpressionInfo(classOf[graft.functions.BpeApplyMerges].getName, "graft_bpe_apply"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeApplyMerges(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_band_values"),
      new ExpressionInfo(classOf[graft.functions.BandValues].getName, "graft_band_values"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BandValues(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_band_hashes"),
      new ExpressionInfo(classOf[graft.functions.BandHashes].getName, "graft_band_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BandHashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_charfold"),
      new ExpressionInfo(classOf[graft.functions.CharFold].getName, "graft_charfold"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CharFold(exprs.head)))
    // optimizer rule: derive parquet-pushable raw-nanos bounds from
    // event-time filters on the converted events.ts column
    ext.injectOptimizerRule(_ => graft.plans.NanosFilterPushdown)
  }
}
