package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first timed query doesn't absorb executor
    // startup + codegen/JIT compiler warmup (~4s otherwise attributed to
    // it). Exercises the scan/join/window/agg/explode/md5 codegen paths on
    // the two tiny dimension tables — untimed, bounded regardless of SF.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .withColumn("rk", row_number().over(w))
        .select(explode(split(col("n_name"), "")).as("c"), col("rk"))
        .groupBy("c").agg(count(lit(1)), min(md5(col("c"))))
        .count()
    }
    // optional args: query-name substrings to run (local iteration aid;
    // the driver passes none and gets the full battery)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => args.exists(n.contains) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
