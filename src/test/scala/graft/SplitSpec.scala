package graft

import graft.operators.Split
import org.apache.spark.sql.functions._

/** Deterministic-split contracts: assignments are pure functions of the
  * key (reproducible without coordination, stable under corpus growth),
  * stratified quotas are ceil-exact per stratum, grouped splits are
  * leak-free by construction, and salts decorrelate.
  */
class SplitSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(j => (j.toLong, s"l${j % 3}", s"text $j"))
      .toDF("id", "lang", "text")

  test("threshold split is a pure function of the key: stable under " +
      "corpus growth, reproducible across invocations, zero shuffles") {
    val small = Split.threshold(corpus(500), col("id"), 80, 10)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = Split.threshold(corpus(1000), col("id"), 80, 10)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every original row keeps its assignment when the corpus doubles —
    // the anti-reshuffle property ORDER BY rand() splits lack
    assert(small.forall { case (k, v) => big(k) == v })
    // proportions land near the buckets (hash is uniform-ish)
    val frac = big.values.count(_ == "train").toDouble / big.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // pure projection: no exchange in the plan
    val plan = Split.threshold(corpus(100), col("id"), 80, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("stratified split hits ceil-exact quotas inside every stratum") {
    val out = Split.stratified(corpus(1000), Seq("lang"), col("id"), 0.8, 0.1)
    val counts = out.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("l0", "l1", "l2")) {
      val n = Seq("train", "val", "test")
        .map(s => counts.getOrElse((l, s), 0L)).sum
      val train = counts((l, "train"))
      val vl = counts.getOrElse((l, "val"), 0L)
      assert(train === math.ceil(n * 0.8).toLong, s"$l train")
      assert(train + vl === math.ceil(n * (0.8 + 0.1)).toLong, s"$l val")
    }
    // deterministic: a second run is row-identical
    val a = out.select("id", "split").collect().toSet
    val b = Split.stratified(corpus(1000), Seq("lang"), col("id"), 0.8, 0.1)
      .select("id", "split").collect().toSet
    assert(a === b)
  }

  test("byGroup never splits a group across splits; salts decorrelate " +
      "assignments") {
    val df = corpus(900).withColumn("grp", col("id") % 100)
    val out = Split.byGroup(df, "grp", 80, 10)
    val perGroup = out.groupBy("grp")
      .agg(countDistinct("split").as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L),
      "a group straddled two splits")
    // a different salt must reassign a nontrivial share of groups
    val s1 = Split.byGroup(df, "grp", 80, 10, salt = "a")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Split.byGroup(df, "grp", 80, 10, salt = "b")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = s1.count { case (k, v) => s2(k) != v }
    assert(moved > 0, "salt had no effect")
    // validation guards
    intercept[IllegalArgumentException] {
      Split.threshold(df, col("id"), 0, 10)
    }
    intercept[IllegalArgumentException] {
      Split.stratified(df, Seq("lang"), col("id"), 0.9, 0.2)
    }
  }

  test("mixture: downsampling tracks the rate, upsampling emits " +
      "fractional epochs with copy indices, unlisted strata pass; " +
      "pure map (no Exchange)") {
    val df = corpus(3000)
    val out = Split.mixture(df, "lang",
      Map("l0" -> 0.5, "l1" -> 2.5), col("id"))
    val by = out.groupBy("lang")
      .agg(count(lit(1)).as("n"), max("mix_copy").as("mc"),
        countDistinct("id").as("d"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val per = 1000L // rows per lang in corpus(3000)
    // l0 halved (hash-exact in expectation: within ±10%)
    assert(math.abs(by("l0")._1 - per / 2) < per / 10, by("l0").toString)
    assert(by("l0")._2 === 0L)
    // l1 at 2.5 epochs: every doc kept (distinct = per), 2 or 3 copies
    assert(by("l1")._3 === per)
    assert(by("l1")._2 === 2L)
    assert(math.abs(by("l1")._1 - (per * 5) / 2) < per / 4, by("l1").toString)
    // l2 unlisted: every row exactly once
    assert(by("l2") === ((per, 0L, per)))
    // determinism + stability: same call, same rows; rate 0 empties
    assert(Split.mixture(df, "lang", Map("l0" -> 0.5, "l1" -> 2.5),
      col("id")).groupBy("lang").count().collect().toSet ===
      out.groupBy("lang").count().collect().toSet)
    assert(Split.mixture(df, "lang", Map("l2" -> 0.0), col("id"))
      .filter(col("lang") === "l2").count() === 0L)
    val plan = Split.mixture(df, "lang", Map("l0" -> 0.5), col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    intercept[IllegalArgumentException] {
      Split.mixture(df, "lang", Map("l0" -> -0.1), col("id"))
    }
  }

  test("threshold and mixture are stateless projections: they run on a " +
      "STREAMING frame and agree with the batch assignment") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_splitstream").toString
    try {
      val d = corpus(300)
      d.coalesce(1).write.mode("overwrite").parquet(s"$work/src")
      val stream = spark.readStream.schema(d.schema).parquet(s"$work/src")
      val out = Split.mixture(
        Split.threshold(stream, col("id"), 80, 10),
        "lang", Map("l1" -> 2.0), col("id"))
      val q = out.writeStream.format("memory").queryName("split_stream")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val streamed = spark.table("split_stream")
        .select("id", "split", "mix_copy").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Split.mixture(
        Split.threshold(d, col("id"), 80, 10),
        "lang", Map("l1" -> 2.0), col("id"))
        .select("id", "split", "mix_copy").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(work))
  }
}
