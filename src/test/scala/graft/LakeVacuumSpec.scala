package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path

/** Explicit retention GC ([[Lake.vacuum]]): prunes outside the horizon
  * without requiring a publish, never touches the current generation
  * (even below the horizon after a rollback), keeps physical donors of
  * retained deltas alive, removes crashed-publish orphans, and reports
  * every decision with its reason.
  */
class LakeVacuumSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(tag: String) =
    (0 until 20).map(j => (s"d-$j", "g0", s"$tag $j")).toDF("id", "k", "text")

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_lakevac").toString + "/lake"

  private def cleanup(root: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)

  private def actions(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, String)] =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap

  test("prunes outside the horizon, keeps the last `keep` published; a " +
      "pinned read of a pruned generation fails loudly") {
    val root = tmp()
    try {
      for (i <- 0 to 3)
        Lake.publishVersion(corpus(s"g$i"), root, Seq("k"), Seq("id"),
          1000L, keep = 10) // keep=10: publish-time pruning disabled
      val rep = actions(Lake.vacuum(spark, root, keep = 2))
      assert(rep === Map(
        0L -> ("pruned", "outside_horizon"),
        1L -> ("pruned", "outside_horizon"),
        2L -> ("retained", "horizon"),
        3L -> ("retained", "horizon")))
      assert(Lake.readVersion(spark, root).count() === 20L)
      val e = intercept[IllegalStateException] {
        Lake.readVersion(spark, root, Some(0L))
      }
      assert(e.getMessage.contains("pruned"))
    } finally cleanup(root)
  }

  test("the current generation is never pruned, even below the horizon " +
      "after a rollback") {
    val root = tmp()
    try {
      for (i <- 0 to 3)
        Lake.publishVersion(corpus(s"g$i"), root, Seq("k"), Seq("id"),
          1000L, keep = 10)
      Lake.rollbackTo(spark, root, 0L)
      val rep = actions(Lake.vacuum(spark, root, keep = 2))
      assert(rep(0L) === ("retained", "current"))
      assert(rep(1L) === ("pruned", "outside_horizon"))
      assert(rep(2L) === ("retained", "horizon"))
      assert(rep(3L) === ("retained", "horizon"))
      assert(Lake.readVersion(spark, root).count() === 20L) // still v0
    } finally cleanup(root)
  }

  test("a physical donor of a retained delta survives below the horizon; " +
      "the delta stays readable after the vacuum") {
    val root = tmp()
    try {
      // v0 full (two partitions), v1..v3 deltas each rewriting g1 only —
      // all inherit g0 from v0
      Lake.publishVersion(
        (0 until 20).map(j => (s"a-$j", "g0", s"base $j")).toDF(
          "id", "k", "text").unionByName(
          (0 until 20).map(j => (s"b-$j", "g1", s"base $j")).toDF(
            "id", "k", "text")),
        root, Seq("k"), Seq("id"), 1000L, keep = 10)
      for (i <- 1 to 3)
        Lake.publishDelta(
          (0 until 20).map(j => (s"b-$j", "g1", s"d$i $j")).toDF(
            "id", "k", "text"),
          root, Seq("k"), Seq("id"), 1000L, keep = 10)
      val rep = actions(Lake.vacuum(spark, root, keep = 2))
      assert(rep(0L) === ("retained", "referenced")) // g0 donor
      assert(rep(1L) === ("pruned", "outside_horizon"))
      assert(rep(2L) === ("retained", "horizon"))
      assert(rep(3L) === ("retained", "horizon"))
      // both retained deltas still resolve their inherited partition
      assert(Lake.readVersion(spark, root, Some(2L))
        .filter(org.apache.spark.sql.functions.col("k") === "g0")
        .count() === 20L)
      assert(Lake.readVersion(spark, root).count() === 40L)
    } finally cleanup(root)
  }

  test("a reader scanning the current generation is undisturbed by a " +
      "concurrent vacuum pruning old generations") {
    val root = tmp()
    try {
      for (i <- 0 to 3)
        Lake.publishVersion(corpus(s"g$i"), root, Seq("k"), Seq("id"),
          1000L, keep = 10)
      // reader loop on the current generation races the vacuum: the
      // current dir is protected, so every read must succeed with the
      // full row count — pruning only ever touches non-current,
      // non-horizon generations
      val errors = new java.util.concurrent.atomic.AtomicReference[String]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            val n = Lake.readVersion(spark, root).count()
            if (n != 20L) errors.compareAndSet(null, s"read $n rows"): Unit
          } catch {
            case t: Throwable =>
              errors.compareAndSet(null, t.toString): Unit
          }
        }
      })
      reader.start()
      try {
        Thread.sleep(100)
        val rep = actions(Lake.vacuum(spark, root, keep = 1))
        assert(rep(0L)._1 === "pruned" && rep(3L)._1 === "retained")
        Thread.sleep(200)
      } finally { stop.set(true); reader.join(10000) }
      assert(errors.get() === null, s"reader failed: ${errors.get()}")
    } finally cleanup(root)
  }

  test("a crashed publish's orphan above the high-water is removed and " +
      "reported as such") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("a"), root, Seq("k"), Seq("id"), 1000L)
      // fake a crashed publish: a generation dir above the high-water
      val fs = new Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(s"$root/v=7/k=g0"))
      val rep = actions(Lake.vacuum(spark, root, keep = 3))
      assert(rep(0L) === ("retained", "horizon"))
      assert(rep(7L) === ("orphan_removed", "above_high_water"))
      assert(!fs.exists(new Path(s"$root/v=7")))
      assert(Lake.readVersion(spark, root).count() === 20L)
    } finally cleanup(root)
  }
}
