package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the right row with the greatest
  * timestamp <= the left timestamp within the same key (point-in-time
  * lookup — "state of X when the event happened").
  *
  * Spark has no native as-of join; the scalable composition (SURVEY.md
  * §7.2 preference (a): built-ins) is the union + running-`last` window:
  * tag both sides, union, sort within key by (ts, side) with the right
  * side first on ties (inclusive semantics), and carry the last non-null
  * right payload forward. ONE shuffle on the key, no time-range join
  * explosion, no per-row point lookups — at 100 TB this is a single
  * sort-merge pass, vs the reference's per-row Redis GET pattern.
  *
  * Right rows must be unique per (key, ts) — ties would make "the" as-of
  * row ambiguous; callers dedupe first (latestPerKey-style).
  */
object AsOf {

  /** @param left  (key, ts, payload...) probe side
    * @param right (key, ts, payload...) build side, unique per (key, ts)
    * @param on    key column name (same on both sides)
    * @param ts    epoch column name (same on both sides, integral)
    * @param rightCols right payload columns to carry to the output
    * @return left rows + as-of matched rightCols (inner: unmatched dropped)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: String,
      ts: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == on || c == ts).toSeq
    val l = left.withColumn("__side", lit(1))
      .select(Seq(col(on), col(ts), col("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.withColumn("__side", lit(0))
      .select(Seq(col(on), col(ts), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(col): _*)
    // right rows sort before left rows at equal ts → inclusive (<=) match
    val w = Window.partitionBy(on)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(Seq(col(on), col(ts), col("__side")) ++ leftCols.map(col) ++
        rightCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 1)
      .drop("__side")
      .na.drop(rightCols) // inner join semantics: no prior right row → drop
  }
}
