package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tie-proof float output policy for the DuckDB oracle gate.
  *
  * `round(avg(x), 4)` is NOT cross-engine stable: when the true average
  * lands on a decimal tie (…5 at the 5th decimal), Spark rounds the
  * double's shortest decimal representation HALF_UP while DuckDB rounds
  * numerically, and the two can disagree (observed at sf0.001/sf0.1).
  *
  * The stable recipe, for inputs with a known decimal grain `g`:
  *   1. `round(sum(x)·10^g)` — the true sum is on the 10^-g grid, so this
  *      is the same exact integer in every engine regardless of summation
  *      order (error ≪ 0.5);
  *   2. divide by 10^g and by count — identical IEEE ops on identical
  *      inputs → bit-identical doubles in both engines;
  *   3. `floor(x·10^4)/10^4` — floor of identical doubles never diverges
  *      (no tie-breaking mode exists for floor).
  *
  * SQL mirror: `floor(round(sum(x) * 10^g) / 10^g / count(*) * 10000) / 10000.0`
  */
object Exact {

  /** floor-quantize at `scale` decimals — safe when both engines hold the
    * same double. */
  def floorQ(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p) / p
  }

  /** Exact integer-valued sum (as double) of a column with decimal grain g.
    * NOTE: rounds a DOUBLE sum — exact only while the group's accumulated
    * double error stays under half a grain step (fine at tested SFs; for
    * billion-row groups prefer [[sumGrainExact]]). */
  def sumGrain(c: Column, g: Int): Column = round(sum(c) * math.pow(10, g))

  /** Order-independent integer sum at grain g: round each ROW to the
    * 10^-g grid first, then sum exact integers — immune to accumulated
    * double error at any group size, so Spark's partial-aggregate
    * summation order and DuckDB's single-threaded order can never land
    * on different sides of a rounding boundary.
    * SQL mirror: `CAST(sum(CAST(round(x * 10^g) AS BIGINT)) AS BIGINT)`. */
  def sumGrainExact(c: Column, g: Int): Column =
    sum(round(c * math.pow(10, g)).cast("long"))

  /** Tie-proof 4-decimal average of a column with decimal grain g. */
  def avg4(c: Column, g: Int): Column =
    floorQ(sumGrain(c, g) / math.pow(10, g) / count(lit(1)), 4)
}
