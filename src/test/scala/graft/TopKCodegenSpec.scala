package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopK

/** Pins that `TopKPerKeyPartialExec`'s whole-stage codegen actually
  * COMPILES for the child shapes the battery runs it over — with
  * `spark.sql.codegen.fallback=false` a Janino failure is a thrown
  * exception here, not a silent interpreted fallback behind a WARN.
  *
  * The three shapes are the ones that historically failed ("Redefinition
  * of local variable"): the partial pass consumes its child via the
  * row variable (`row.code` re-evaluates the child's column vars), so if
  * `usedInputs` also reports the key/order columns, `consume()` emits
  * those columns' declarations a second time via
  * `evaluateRequiredVariables` whenever keys+order reference a STRICT
  * subset of a variable-producing child's output:
  *   (a) LocalTableScan child, keys subset — the streaming micro-batch
  *       latest-per-key compact;
  *   (b) BroadcastNestedLoopJoin child — IVF cell-selection stages;
  *   (c) a long fused projection stage with k=40 — text_domain_cap.
  */
class TopKCodegenSpec extends SparkSuite {

  private def withNoFallback[A](body: => A): A = {
    val was = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally spark.conf.set("spark.sql.codegen.fallback", was)
  }

  private def windowEquiv(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val cols = order.map { case (n, desc) => if (desc) col(n).desc else col(n).asc }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(cols: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("codegen compiles: LocalTableScan child, keys strict subset, k=1") {
    import spark.implicits._
    withNoFallback {
      // 4 columns, keys+order touch only 3 — the shape that double-declared
      // the child's column vars before the usedInputs fix
      val df = Seq(
        ("t1", 1L, 3L, "a"), ("t1", 1L, 7L, "b"), ("t1", 2L, 1L, "c"),
        ("t2", 1L, 9L, "d"), ("t2", 1L, 2L, "e")
      ).toDF("table", "rid", "seq", "data")
      val got = TopK.perKey(df, Seq("table", "rid"), Seq(("seq", true)), k = 1)
      val want = windowEquiv(df, Seq("table", "rid"), Seq(("seq", true)), 1)
      assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
      val plan = got.queryExecution.executedPlan.toString
      assert("\\*\\(\\d+\\) TopKPerKeyPartial".r.findFirstIn(plan).isDefined,
        s"partial pass not in a codegen span:\n$plan")
    }
  }

  test("codegen compiles: BroadcastNestedLoopJoin child, k=2") {
    import spark.implicits._
    withNoFallback {
      val vecs = Seq((1L, 0.1), (2L, 0.8), (3L, 0.5)).toDF("vec_id", "x")
      val cells = Seq((10L, 0.2), (11L, 0.6), (12L, 0.9)).toDF("cell", "cx")
      // cross product + computed similarity, then per-vec top-2 cells —
      // the IVF cell-selection shape
      val scored = vecs.crossJoin(broadcast(cells))
        .withColumn("csim", -abs(col("x") - col("cx")))
      val got = TopK.perKey(scored, Seq("vec_id"), Seq(("csim", true), ("cell", false)), k = 2)
      val want = windowEquiv(scored, Seq("vec_id"), Seq(("csim", true), ("cell", false)), 2)
      assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), s"repro lost its BNLJ child:\n$plan")
    }
  }

  test("codegen compiles: long fused projection stage, k=40") {
    import spark.implicits._
    withNoFallback {
      val base = (1 to 500).map(i => (s"src${i % 7}", i.toLong, s"doc$i"))
        .toDF("source", "id", "text")
      // a dozen fused operators above the scan, like text_domain_cap's stage
      val wide = base
        .withColumn("hk", xxhash64(col("text")))
        .withColumn("len", length(col("text")))
        .withColumn("w1", col("len") * 2)
        .withColumn("w2", col("hk") % 97)
        .withColumn("w3", concat(col("source"), lit("|"), col("text")))
        .withColumn("w4", substring(col("w3"), 1, 6))
        .withColumn("w5", when(col("w2") > 0, col("w2")).otherwise(-col("w2")))
        .withColumn("w6", col("id") + col("len"))
        .filter(col("len") > 3)
      val got = TopK.perKey(wide, Seq("source"), Seq(("hk", false), ("id", false)), k = 40)
      val want = windowEquiv(wide, Seq("source"), Seq(("hk", false), ("id", false)), 40)
      assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    }
  }
}
