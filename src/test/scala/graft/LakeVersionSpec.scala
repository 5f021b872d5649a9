package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Versioned-publishing contract: generations are immutable once
  * published, the pointer flip is the only mutation a reader can observe,
  * time travel reproduces exactly what an old pointer read, rollback is a
  * pure flip, retention prunes only beyond the horizon, crashed publishes
  * heal, and a concurrent reader NEVER fails or sees a torn generation —
  * the guarantee the in-place swap cannot give.
  */
class LakeVersionSpec extends SparkSuite {
  import spark.implicits._

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def genOf(n: Int, rows: Int = 40) = (0 until rows)
    .map(j => (j.toLong, s"g${j % 2}", n, s"doc $j gen $n"))
    .toDF("id", "k", "generation", "text")

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_lakever").toString + "/lake"

  private def listing(dir: String): Map[String, (Long, Long)] = {
    val fs = fsOf(dir)
    val it = fs.listFiles(new Path(dir), true)
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) { val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        b += (st.getPath.toString -> ((st.getLen, st.getModificationTime))) }
    b.result()
  }

  test("publish → read → time travel → rollback; published generations " +
      "are byte-immutable") {
    val root = tmp()
    try {
      assert(Lake.currentVersion(spark, root).isEmpty)
      val v0 = Lake.publishVersion(genOf(0), root, Seq("k"), Seq("id"), 1000L)
      assert(v0 === 0L)
      assert(Lake.currentVersion(spark, root).contains(0L))
      val gen0Files = listing(s"$root/v=0")
      assert(gen0Files.nonEmpty)

      val v1 = Lake.publishVersion(genOf(1), root, Seq("k"), Seq("id"), 1000L)
      assert(v1 === 1L && Lake.currentVersion(spark, root).contains(1L))
      // immutability: publishing v1 moved/rewrote NOTHING inside v=0
      assert(listing(s"$root/v=0") === gen0Files)

      def gens(df: org.apache.spark.sql.DataFrame): Set[Int] =
        df.select("generation").distinct().collect().map(_.getInt(0)).toSet
      assert(gens(Lake.readVersion(spark, root)) === Set(1))
      assert(gens(Lake.readVersion(spark, root, Some(0L))) === Set(0))

      Lake.rollbackTo(spark, root, 0L)
      assert(Lake.currentVersion(spark, root).contains(0L))
      assert(gens(Lake.readVersion(spark, root)) === Set(0))
      // the rolled-back-over generation WAS published and is within
      // retention — a pinned consumer can still reproduce what it read
      assert(gens(Lake.readVersion(spark, root, Some(1L))) === Set(1))
      assert(Lake.publishedHighWater(spark, root).contains(1L))
      // the next publish allocates ABOVE the high-water: no number reuse
      val v2 = Lake.publishVersion(genOf(7), root, Seq("k"), Seq("id"), 1000L)
      assert(v2 === 2L)
      assert(gens(Lake.readVersion(spark, root)) === Set(7))
      // ...and the rolled-back-over generation survives it (retention,
      // not publish, is what removes published history)
      assert(gens(Lake.readVersion(spark, root, Some(1L))) === Set(1))
      // a version above the high-water was never published
      intercept[IllegalStateException] {
        Lake.readVersion(spark, root, Some(9L))
      }
      // version-to-version diff: ids identical, every content differs
      // (generation stamp in the text) — all 'changed', none added/removed
      val d = Lake.diffVersions(spark, root, 0L, 1L, "id", "text")
        .groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(d === Map("changed" -> 40L), d.toString)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("retention prunes only beyond the horizon; pruned versions fail " +
      "loudly; crashed publishes heal") {
    val root = tmp()
    try {
      (0 to 3).foreach(i =>
        Lake.publishVersion(genOf(i), root, Seq("k"), Seq("id"), 1000L,
          keep = 2))
      val fs = fsOf(root)
      val dirs = fs.listStatus(new Path(root))
        .filter(_.getPath.getName.startsWith("v="))
        .map(_.getPath.getName).sorted.toSeq
      assert(dirs === Seq("v=2", "v=3"), dirs.toString)
      val e = intercept[IllegalStateException] {
        Lake.readVersion(spark, root, Some(0L))
      }
      assert(e.getMessage.contains("pruned") ||
        e.getMessage.contains("never published"))
      // crash simulation: an orphaned generation ABOVE the pointer (a
      // publish that died before its flip) is removed by the next publish
      fs.mkdirs(new Path(root, "v=9"))
      val v4 = Lake.publishVersion(genOf(4), root, Seq("k"), Seq("id"),
        1000L, keep = 2)
      assert(v4 === 4L)
      assert(!fs.exists(new Path(root, "v=9")))
      assert(Lake.readVersion(spark, root).select("generation").distinct()
        .collect().map(_.getInt(0)).toSeq === Seq(4))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a crash mid pointer-flip (tmp written, committed file deleted) " +
      "never loses history: readers resolve the tmp, the next publish " +
      "completes the flip instead of wiping") {
    val root = tmp()
    try {
      Lake.publishVersion(genOf(0), root, Seq("k"), Seq("id"), 1000L)
      Lake.publishVersion(genOf(1), root, Seq("k"), Seq("id"), 1000L)
      val fs = fsOf(root)
      // simulate the exact delete-then-rename window of a rollback to 0:
      // tmp holds the new value, the committed pointer is gone
      val os = fs.create(new Path(root, "._CURRENT.tmp"), true)
      os.write("0".getBytes("UTF-8")); os.close()
      fs.delete(new Path(root, "_CURRENT"), false)
      // a reader inside the window still resolves a version (the tmp)
      assert(Lake.currentVersion(spark, root).contains(0L))
      assert(Lake.readVersion(spark, root).select("generation").distinct()
        .collect().map(_.getInt(0)).toSeq === Seq(0))
      // the next publish recovers (completes the flip) — it must NOT
      // treat the root as empty and delete the published generations
      val v2 = Lake.publishVersion(genOf(2), root, Seq("k"), Seq("id"), 1000L)
      assert(v2 === 2L, "recovery must resume numbering, not restart at 0")
      assert(fs.exists(new Path(root, "v=0")) &&
        fs.exists(new Path(root, "v=1")), "published history survived")
      assert(Lake.readVersion(spark, root, Some(1L)).count() === 40L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a pointer lost OUTSIDE the protocol (no tmp either) adopts the " +
      "highest on-disk generation — orphan cleanup never wipes a " +
      "populated root") {
    val root = tmp()
    try {
      Lake.publishVersion(genOf(0), root, Seq("k"), Seq("id"), 1000L)
      Lake.publishVersion(genOf(1), root, Seq("k"), Seq("id"), 1000L)
      val fs = fsOf(root)
      fs.delete(new Path(root, "_CURRENT"), false)
      fs.delete(new Path(root, "_HIGH"), false)
      val v2 = Lake.publishVersion(genOf(2), root, Seq("k"), Seq("id"), 1000L)
      assert(v2 === 2L)
      assert(fs.exists(new Path(root, "v=0")) &&
        fs.exists(new Path(root, "v=1")), "published history survived")
      assert(Lake.readVersion(spark, root).select("generation").distinct()
        .collect().map(_.getInt(0)).toSeq === Seq(2))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a crash between the _HIGH and _CURRENT flips leaves a complete, " +
      "pinned-readable generation that is never re-numbered or deleted") {
    val root = tmp()
    try {
      Lake.publishVersion(genOf(0), root, Seq("k"), Seq("id"), 1000L)
      Lake.publishVersion(genOf(1), root, Seq("k"), Seq("id"), 1000L)
      val fs = fsOf(root)
      // simulate: v=1's publish committed _HIGH but died before _CURRENT
      // (equivalently: roll _CURRENT back to 0 by hand, keeping _HIGH=1)
      val os = fs.create(new Path(root, "_CURRENT"), true)
      os.write("0".getBytes("UTF-8")); os.close()
      assert(Lake.currentVersion(spark, root).contains(0L))
      // v=1 is complete and below the high-water: pinned-readable
      assert(Lake.readVersion(spark, root, Some(1L)).count() === 40L)
      // the next publish allocates ABOVE it and leaves it on disk
      val v2 = Lake.publishVersion(genOf(2), root, Seq("k"), Seq("id"), 1000L)
      assert(v2 === 2L)
      assert(fs.exists(new Path(root, "v=1")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("publishBatch is exactly-once on batch id across every replay " +
      "crash window") {
    val root = tmp()
    try {
      def pub(n: Int, batchId: Long): Unit = Lake.publishBatch(genOf(n),
        root, Seq("k"), Seq("id"), 1000L, keep = 10, batchId = batchId)
      def gens(df: org.apache.spark.sql.DataFrame): Set[Int] =
        df.select("generation").distinct().collect().map(_.getInt(0)).toSet
      val fs = fsOf(root)

      pub(0, batchId = 0L); pub(1, batchId = 1L)
      assert(Lake.currentVersion(spark, root).contains(1L))
      assert(gens(Lake.readVersion(spark, root)) === Set(1))
      assert(gens(Lake.readVersion(spark, root, Some(0L))) === Set(0))
      // history names each drop's producing batch
      val hist = Lake.history(spark, root)
        .select("v", "batch_id", "current").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(hist === Map(0L -> ((0L, false)), 1L -> ((1L, true))))

      // plain replay of a committed batch: publishes NOTHING new
      pub(7, batchId = 1L) // even with different data — the id governs
      assert(Lake.publishedHighWater(spark, root).contains(1L))
      assert(gens(Lake.readVersion(spark, root)) === Set(1))

      // crash between the _HIGH and _CURRENT flips: data landed, stamp
      // landed, pointer didn't move — the replay must only re-point
      val os = fs.create(new Path(root, "_CURRENT"), true)
      os.write("0".getBytes("UTF-8")); os.close()
      pub(7, batchId = 1L)
      assert(Lake.currentVersion(spark, root).contains(1L),
        "replay did not finish the interrupted pointer flip")
      assert(gens(Lake.readVersion(spark, root)) === Set(1),
        "replay re-published an already-landed batch")

      // crash before the _HIGH flip: the partial generation is an
      // unpublished orphan — the replay wipes it and publishes cleanly
      fs.mkdirs(new Path(root, "v=2"))
      // ...and the ledger names it for what it is while it sits there
      val orphanRow = Lake.history(spark, root)
        .filter(col("v") === 2L).select("published", "n_rows").collect()
      assert(orphanRow.map(r => (r.getBoolean(0), r.getLong(1))).toSeq ===
        Seq((false, 0L)))
      pub(2, batchId = 2L)
      assert(Lake.currentVersion(spark, root).contains(2L))
      assert(gens(Lake.readVersion(spark, root)) === Set(2))

      // an empty batch is not a dataset version
      pub(3, batchId = 3L)
      Lake.publishBatch(genOf(9).limit(0), root, Seq("k"), Seq("id"),
        1000L, keep = 10, batchId = 4L)
      assert(Lake.publishedHighWater(spark, root).contains(3L))
      assert(gens(Lake.readVersion(spark, root)) === Set(3))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a concurrent reader through the pointer NEVER fails and always " +
      "sees one complete generation") {
    val root = tmp()
    try {
      Lake.publishVersion(genOf(0), root, Seq("k"), Seq("id"), 1000L,
        keep = 100) // horizon >> test length: no pruning under readers
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get() && bad.get() == null) {
          try {
            val r = Lake.readVersion(spark, root)
              .groupBy("generation").agg(count(lit(1)).as("n")).collect()
            if (r.length != 1)
              bad.compareAndSet(null, s"${r.length} generations in one read")
            else if (r.head.getLong(1) != 40L)
              bad.compareAndSet(null, s"torn read: ${r.head.getLong(1)} rows")
          } catch {
            // NO exception is acceptable here — that is the whole point
            // of pointer-resolved immutable generations
            case t: Throwable =>
              bad.compareAndSet(null, s"reader threw: $t")
          }
        }
      })
      reader.start()
      try (1 to 8).foreach(i =>
        Lake.publishVersion(genOf(i), root, Seq("k"), Seq("id"), 1000L,
          keep = 100))
      finally { stop.set(true); reader.join(30000) }
      assert(bad.get() == null, String.valueOf(bad.get()))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }
}
