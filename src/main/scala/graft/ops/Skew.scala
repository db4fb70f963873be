package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (the "salting" half of the scale toolkit; AQE's
  * runtime skew-join splitting is the other half and stays enabled).
  *
  * Salting spreads a hot key over `saltFactor` sub-keys: the fact side gets
  * a deterministic salt derived from its own row content, the dimension side
  * is replicated once per salt value, and the join key becomes
  * (key, salt).  Results are provably identical to the unsalted join/agg
  * (SkewSpec), but a key holding p% of the rows now occupies p/saltFactor %
  * per task — the difference between a straggler task OOMing at 100 TB and
  * an even stage.
  */
object Skew {

  /** Deterministic per-row salt in [0, saltFactor): hash of the given
    * columns (NOT rand() — keeps plans replayable/AQE-safe). */
  def salt(saltFactor: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(saltFactor))

  /** Inner equi-join `fact ⋈ dim` on `key`, salted: dim replicated
    * saltFactor times, fact salted by hash of `saltBy` columns. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int, saltBy: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      salt(saltFactor, saltBy.map(fact(_)): _*))
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: count/sum per (key, salt) partially,
    * then merge per key.  The partial shuffle spreads a hot key across
    * saltFactor reducers. */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int,
      saltBy: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(saltFactor, saltBy.map(df(_)): _*))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
