package graft

import org.apache.spark.sql.functions._

/** Bounded-error checks for the two engine-specific sketches. Since r17 the
  * gate queries (q15_approx_distinct / q19b_approx_percentiles) emit exact
  * values plus a boolean |approx-exact|/exact <= bound gate so they hash
  * against a DuckDB oracle computing ITS own sketch; this spec keeps the
  * TIGHTER engine-side envelopes (3×rsd for HLL++, rank-error for GK) by
  * recomputing the raw sketch values inline, and additionally pins that the
  * gate queries' boolean columns are all-true at sf0.01 AND sf0.1.
  *
  *  - HLL++: within 3×rsd of countDistinct — rsd is one standard deviation
  *    of the estimator, so 3× is a conservative envelope, and the estimate
  *    is deterministic for fixed data, so the test cannot flake once green.
  *  - approx_percentile (Greenwald-Khanna, accuracy=1000): the returned
  *    value's RANK is within 1/accuracy of the target, so the value must
  *    lie between the exact percentiles at rank p ± 1/accuracy.
  */
class SketchBoundsSpec extends SparkSuite {

  private val sfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("gate queries emit all-true accuracy booleans") {
    for (dir <- sfDirs) {
      val q15 = SparkEntry.queries("q15_approx_distinct")(spark, dir)
        .collect()
      assert(q15.nonEmpty)
      for (r <- q15) {
        assert(r.getBoolean(r.fieldIndex("approx_parts_ok")), s"$dir $r")
        assert(r.getBoolean(r.fieldIndex("approx_orders_ok")), s"$dir $r")
      }
      val q19b = SparkEntry.queries("q19b_approx_percentiles")(spark, dir)
        .collect()
      assert(q19b.nonEmpty)
      for (r <- q19b; c <- Seq("approx_p50_ok", "approx_p90_ok",
          "approx_p99_ok")) {
        assert(r.getBoolean(r.fieldIndex(c)), s"$dir $c $r")
      }
    }
  }

  test("approx_count_distinct within 3*rsd of exact per group") {
    for (dir <- sfDirs) {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          countDistinct("l_partkey").as("ep"),
          countDistinct("l_orderkey").as("eo"))
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        val g = r.getString(0)
        val (ap, ao, ep, eo) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        // default rsd 0.05 for l_partkey; explicit 0.02 for l_orderkey
        assert(math.abs(ap - ep) <= 3 * 0.05 * ep,
          s"$dir group $g: approx_parts $ap vs exact $ep")
        assert(math.abs(ao - eo) <= 3 * 0.02 * eo,
          s"$dir group $g: approx_orders $ao vs exact $eo")
      }
    }
  }

  test("approx_percentile within rank error 1/accuracy of exact") {
    val eps = 1.0 / 1000 // the query's accuracy parameter
    val ps = Seq(0.5, 0.9, 0.99)
    for (dir <- sfDirs) {
      val approx = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p90"),
          expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("p99"))
        .collect()
        .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
          r.getDouble(3)))
        .toMap
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
