package graft

import org.apache.spark.sql.functions._

/** Statistics-driven planning: ANALYZE TABLE column stats + CBO let the
  * optimizer see through a selective filter and broadcast the (estimated-
  * tiny) filtered side — the decision a 100 TB join gets right only when
  * the stats pass (the `q32_table_stats` shape) has run. Without column
  * stats the filtered side keeps its full-scan size estimate and the join
  * stays sort-merge.
  */
class CboSpec extends SparkSuite {

  test("ANALYZE column stats flip a filtered join from shuffle to broadcast") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    spark.sql("DROP TABLE IF EXISTS cbo_li")
    spark.sql("DROP TABLE IF EXISTS cbo_o")
    try {
      spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.option("path", s"$wh/li").mode("overwrite")
        .saveAsTable("cbo_li")
      spark.read.parquet(s"$sf0001/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.option("path", s"$wh/o").mode("overwrite")
        .saveAsTable("cbo_o")
      // the filtered side is a tiny fraction of rows but the same FILES —
      // only column stats let the optimizer estimate the selectivity
      def joined = spark.table("cbo_li")
        .filter(col("l_quantity") > 49.5)
        .join(spark.table("cbo_o"),
          col("l_orderkey") === col("o_orderkey"))
      // drop the broadcast threshold so only a small ESTIMATE broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 8 * 1024)
      spark.conf.set("spark.sql.cbo.enabled", "true")

      val before = joined.queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin"),
        s"expected SMJ without stats:\n${before.take(2000)}")

      spark.sql("ANALYZE TABLE cbo_li COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE cbo_o COMPUTE STATISTICS FOR ALL COLUMNS")
      val after = joined.queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"expected BHJ with column stats:\n${after.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS cbo_li")
      spark.sql("DROP TABLE IF EXISTS cbo_o")
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(wh))
    }
  }
}
