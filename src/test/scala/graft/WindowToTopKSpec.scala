package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rank-limit rewrite: `row_number() <= k` + drop(rank) becomes the
  * bounded-heap TopKPerKey operator, result-identically; shapes where the
  * rewrite would be WRONG (rank kept, disjunctive rank predicate) keep
  * their window.
  *
  * Baselines keep the rank column in the output — that shape never
  * rewrites, so the expected sets come from a genuine window plan even
  * though the rule is registered on the shared session.
  */
class WindowToTopKSpec extends SparkSuite {

  private lazy val li = {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/lineitem.parquet")
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rank-limit + drop(rank) rewrites to the heap, result-identical") {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val rewritten = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
      .select("l_orderkey", "l_linenumber")
    val plan = planOf(rewritten)
    assert(plan.contains("TopKPerKey"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    // baseline keeps the rank → stays a window plan
    val baseline = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("l_orderkey", "l_linenumber", "rk")
    assert(planOf(baseline).contains("Window"))
    def keys(df: DataFrame) = df.select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(keys(rewritten) === keys(baseline))
  }

  test("latest-per-key (row_number = 1 desc) + residual predicate rewrites") {
    // THE CDC compaction idiom: newest change per key, tombstones dropped
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_linenumber").desc)
    val compacted = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("l_quantity") > 10.0)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val plan = planOf(compacted)
    assert(plan.contains("TopKPerKey"), plan.take(2500))
    assert(!plan.contains("Window"), plan.take(2500))
    // residual survives as a Filter above the heap
    assert(plan.contains("l_quantity"), plan.take(2500))
    val baseline = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("l_quantity") > 10.0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "rn")
    assert(planOf(baseline).contains("Window"))
    assert(compacted.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      === baseline.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("the CDC-refresh gate query compacts through the heap, not a sort") {
    GraftExtensions.register(spark)
    // dedup_cdc_refresh's latest-per-key step is the idiom the rule
    // exists for: rn = 1 over (doc_id, seq desc), rank dropped by the
    // downstream aggregate — the changelog compacts with NO per-key sort
    val plan = planOf(SparkEntry.queries("dedup_cdc_refresh")(spark, sf0001))
    assert(plan.contains("TopKPerKey"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("no rewrite when the rank survives or the predicate is disjunctive") {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_orderkey"))
    // rank in output: TopKPerKeyNode cannot produce it
    val keepsRank = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).select("l_orderkey", "rk")
    assert(planOf(keepsRank).contains("Window"))
    assert(!planOf(keepsRank).contains("TopKPerKey"))
    // rank under OR: not a pure limit — must stay a window
    val disjunctive = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2 || col("l_quantity") > 45.0)
      .drop("rk").select("l_orderkey")
    assert(planOf(disjunctive).contains("Window"))
    assert(!planOf(disjunctive).contains("TopKPerKey"))
    // GLOBAL top-k (empty partitionBy): TopKPerKeyExec would demand
    // ClusteredDistribution(Nil), which Spark rejects — must not rewrite,
    // and must still execute
    val global = li
      .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
      .filter(col("rk") <= 4).drop("rk").select("l_orderkey")
    assert(planOf(global).contains("Window"))
    assert(!planOf(global).contains("TopKPerKey"))
    assert(global.count() === 4L)
  }
}
