package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-identity synthesis (reference `_gen_rid`, rcache.py:186-193).
  *
  * Composite primary keys are joined with '&' into a single string row-id;
  * a single key passes through as its string value; a table with neither a
  * primary key nor a configured unique key is a hard error (SaveIgnore,
  * rcache.py:232-235 / cdc.py:114-118).
  *
  * Spark-first: this is a plan-time `Column` built from `concat_ws` — fully
  * codegen'd, no UDF. At 100 TB the rid is the shuffle key of the merge, so
  * it must be cheap and skew-aware; `concat_ws` over key columns is both
  * (skew handling lives in the merge operator, not here).
  */
object Rid {

  /** Exception analog of the reference's SaveIgnore (rcache.py:9-10). */
  final class SaveIgnore(msg: String) extends RuntimeException(msg)

  /** rid column from primary-key columns: `concat_ws("&", pk...)`. */
  def rid(pkCols: Seq[String]): Column = {
    if (pkCols.isEmpty)
      throw new SaveIgnore("Do not support table without primary_key")
    concat_ws("&", pkCols.map(c => col(c).cast("string")): _*).as("rid")
  }

  /** PK fallback (cdc.py:114-118): use the event's primary key if present,
    * else the configured unique key for the table, else fail.
    */
  def resolveKey(
      table: String,
      eventPk: Seq[String],
      uniqueKeyConf: Map[String, Seq[String]]): Seq[String] = {
    if (eventPk.nonEmpty) eventPk
    else uniqueKeyConf.getOrElse(
      table,
      throw new SaveIgnore(s"Do not support table[$table] without primary_key"))
  }
}
