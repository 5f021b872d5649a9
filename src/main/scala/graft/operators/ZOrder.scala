package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order clustering for multi-column data skipping ([EXT]) — the
  * OPTIMIZE ZORDER of log-structured table formats, as a layout
  * transform: each clustering column maps to its quantile bucket
  * (boundaries from one approx-quantile pass, shipped as a literal
  * array), the bucket bits interleave into one z-value, and sorting the
  * write by that value makes parquet row-group min/max stats selective
  * on EVERY clustering column at once. A single-column sort gives
  * perfect skipping on that column and none on the others; the z-curve
  * trades a little of the first column's locality for skipping on all
  * of them — at 100 TB this is the difference between a point-ish
  * filter on a second dimension reading row groups proportional to its
  * selectivity and reading the whole partition.
  *
  * Quantile bucketing (not raw bit-slicing) makes the curve
  * distribution-robust: skewed columns still spread across buckets, so
  * no curve cell collapses onto one hot value. The boundaries pass is
  * approximate and driver-sized (bounded by `2^bits` doubles per
  * column); the z-value itself is a pure projection — the layout costs
  * one extra sort key, nothing at read time.
  */
object ZOrder {

  /** Quantile-bucket `c` into [0, 2^bits) against precomputed boundary
    * literals: bucket = #boundaries ≤ value, folded over a literal array
    * (one expression, no UDF; NULLs land in bucket 0 so they cluster
    * together at the curve origin).
    */
  private[graft] def bucket(c: Column, boundaries: Seq[Double]): Column =
    aggregate(
      lit(boundaries.toArray),
      lit(0L),
      (acc, b) => acc + when(c.cast("double") >= b, 1L).otherwise(0L))

  /** Interleave the low `bits` bits of each bucket id round-robin —
    * bit i of column j lands at position i·n + j of the z-value.
    */
  private[graft] def interleave(bs: Seq[Column], bits: Int): Column = {
    val n = bs.size
    (0 until bits).flatMap { i =>
      bs.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Append a `_graft_z` clustering column: each of `cols` quantile-
    * bucketed to `bits` bits (boundaries from one approxQuantile pass at
    * `relErr`), bits interleaved. Sort the write by `_graft_z` (the lake
    * writer does this and drops the column — see
    * `Lake.publishVersion(zOrderCols=...)`). Numeric, timestamp, and
    * date columns bucket directly (dates go through an intermediate
    * timestamp cast — Spark has no direct date→double cast); for
    * strings, bucket a numeric surrogate first (e.g. `Split.hashKey`
    * for uniform spread, or a dictionary rank when range locality
    * matters).
    *
    * The input is MATERIALIZED (the house multi-consumer rule): the
    * boundaries pass and the caller's write both consume it, and pure
    * lineage would run the producing pipeline twice — at publish scale,
    * twice the corpus compute.
    */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int = 6,
      relErr: Double = 0.01): DataFrame = {
    require(cols.size >= 2,
      "z-ordering one column is a plain sort — pass it as a sort column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} columns must fit a long")
    val m = graft.Materialize(df)
    def numeric(c: String): org.apache.spark.sql.Column =
      m.schema(c).dataType match {
        case org.apache.spark.sql.types.DateType =>
          col(c).cast("timestamp").cast("double")
        case _ => col(c).cast("double")
      }
    val nb = (1 << bits) - 1
    // one pass computes every column's boundary set; boundaries are
    // deduplicated so constant/low-cardinality columns degrade to fewer
    // (even zero) boundaries instead of a degenerate all-equal fold
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val bounds = m.select(cols.map(c => numeric(c).as(c)): _*).na.fill(0.0)
      .stat.approxQuantile(cols.toArray, probs, relErr)
    val buckets = cols.zip(bounds).map { case (c, bs) =>
      bucket(numeric(c), bs.toSeq.distinct.sorted)
    }
    m.withColumn("_graft_z", interleave(buckets, bits))
  }
}
