package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopK

/** The custom TopKPerKey physical operator must equal the window
  * row_number idiom, and its plan must contain no Sort/Window node.
  */
class TopKSpec extends SparkSuite {

  test("TopKPerKey == window row_number filter, heap plan has no sort") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val order = Seq(("l_extendedprice", true), ("l_orderkey", false),
      ("l_linenumber", false))

    val custom = TopK.perKey(li, Seq("l_suppkey"), order, k = 3)
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber"))
    assert(custom.collect().map(key).toSet === windowed.collect().map(key).toSet)
    assert(custom.count() === windowed.count())

    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("+- Sort"))
    // the required ClusteredDistribution inserted a hash exchange
    assert(plan.contains("Exchange hashpartitioning"))
    // the partial pass participates in whole-stage codegen (fused with the
    // scan — '*(n)' is the codegen-span marker)
    assert("\\*\\(\\d+\\) TopKPerKeyPartial".r.findFirstIn(plan).isDefined,
      s"partial pass not inside a WholeStageCodegen span:\n$plan")
  }

  test("partial heaps bound the exchange to <= mapPartitions * keys * k rows") {
    import org.apache.spark.sql.graft.TopKPerKeyPartialExec
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet").repartition(4)
      val total = li.count()
      val nKeys = li.select("l_suppkey").distinct().count()
      val k = 3
      val custom = TopK.perKey(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), k)
      custom.collect()
      val partialRows = custom.queryExecution.executedPlan
        .collectFirst { case p: TopKPerKeyPartialExec => p.metrics("numOutputRows").value }
        .getOrElse(fail("no TopKPerKeyPartialExec in executed plan"))
      // the exchange carries only the partial survivors, not every row
      assert(partialRows <= 4 * nKeys * k)
      assert(partialRows < total / 10,
        s"partial pass barely reduced the shuffle: $partialRows of $total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
  }

  test("TopKPerKey handles k larger than group size and single groups") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(("v", true)), k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(out === Set((1, 10), (1, 20), (2, 5))) // everything kept
    val top1 = TopK.perKey(df, Seq("g"), Seq(("v", true)), k = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(top1 === Set((1, 20), (2, 5)))
  }
}
