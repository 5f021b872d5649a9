package graft

import org.apache.spark.sql.functions._

/** Bounded-error checks for the two engine-specific sketches that have no
  * DuckDB oracle surface (the driver records rows-only for them). Each is
  * asserted against its exact twin at sf0.01 AND sf0.1:
  *
  *  - q15_approx_distinct (HLL++): within 3×rsd of countDistinct — rsd is
  *    one standard deviation of the HLL estimator, so 3× is a conservative
  *    envelope, and the estimate is deterministic for fixed data, so the
  *    test cannot flake once green.
  *  - q19b_approx_percentiles (Greenwald-Khanna, accuracy=1000): the
  *    returned value's RANK is within 1/accuracy of the target, so the
  *    value must lie between the exact percentiles at rank p ± 1/accuracy.
  */
class SketchBoundsSpec extends SparkSuite {

  private val sfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("q15 approx_count_distinct within 3*rsd of exact per group") {
    for (dir <- sfDirs) {
      val approx = SparkEntry.queries("q15_approx_distinct")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val exact = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("p"),
          countDistinct("l_orderkey").as("o"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(approx.keySet === exact.keySet, s"group sets differ at $dir")
      for ((g, (ep, eo)) <- exact) {
        val (ap, ao) = approx(g)
        // default rsd 0.05 for l_partkey; explicit 0.02 for l_orderkey
        assert(math.abs(ap - ep) <= 3 * 0.05 * ep,
          s"$dir group $g: approx_parts $ap vs exact $ep")
        assert(math.abs(ao - eo) <= 3 * 0.02 * eo,
          s"$dir group $g: approx_orders $ao vs exact $eo")
      }
    }
  }

  test("q19b approx_percentile within rank error 1/accuracy of exact") {
    val eps = 1.0 / 1000 // the query's accuracy parameter
    for (dir <- sfDirs) {
      val approx = SparkEntry.queries("q19b_approx_percentiles")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
          r.getDouble(3)))
        .toMap
      val ps = Seq(0.5, 0.9, 0.99)
      val bcols = ps.flatMap(p => Seq(
        expr(s"percentile(l_extendedprice, ${p - eps})"),
        expr(s"percentile(l_extendedprice, ${math.min(p + eps, 1.0)})")))
      val bounds = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(bcols.head, bcols.tail: _*)
        .collect()
        .map(r => r.getString(0) -> (1 to 6).map(r.getDouble))
        .toMap
      for ((g, vals) <- approx; (v, i) <- vals.zipWithIndex) {
        val lo = bounds(g)(2 * i)
        val hi = bounds(g)(2 * i + 1)
        assert(v >= lo && v <= hi,
          s"$dir group $g p=${ps(i)}: approx $v outside exact-rank " +
            s"envelope [$lo, $hi]")
      }
    }
  }
}
