package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at cluster scale.
  *
  * A single groupBy on a skewed key funnels the hot key's entire volume
  * through one reducer. Salting splits each key into `salts` sub-keys for a
  * parallel partial aggregate, then re-aggregates the partials — the hot
  * key's work spreads over `salts` reducers at the cost of a second (tiny)
  * shuffle. AQE's skew-join handling covers joins; this covers aggregates
  * whose skew AQE cannot split (single-key hash agg).
  *
  * Only algebraic aggregates survive two-phase re-aggregation; the helpers
  * here cover the count/sum family the engine uses.
  */
object Skew {

  /** Deterministic salt from a stable hash of spread columns (NOT rand():
    * retries and speculative tasks must agree on the salt).
    */
  def salt(salts: Int, spreadCols: Column*): Column =
    pmod(hash(spreadCols: _*), lit(salts))

  /** Two-phase salted count+sum per key group.
    *
    * @param df        input
    * @param keyCols   group keys (potentially skewed)
    * @param sumCol    column to sum
    * @param salts     fan-out factor for phase 1
    * @param spreadCol a high-cardinality column to derive the salt from
    * @return keyCols + n (count) + total (sum), equal to the unsalted agg
    */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      sumCol: String,
      salts: Int,
      spreadCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(salts, col(spreadCol)))
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__sum"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__n").as("n"), sum("__sum").as("total"))
  }
}
