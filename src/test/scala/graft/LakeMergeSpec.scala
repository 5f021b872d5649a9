package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** MERGE-into-the-versioned-lake contract ([[Lake.mergeDelta]] /
  * [[Lake.mergeStream]]): a keyed changelog (upsert/delete) applies as
  * one immutable DELTA generation — only the changelog's partitions are
  * read, anti-joined, and rewritten; untouched partitions inherit by
  * reference; a partition deleted empty VANISHES instead of being
  * inherited back; netting keeps the latest action per key; replay is
  * exactly-once on the batch stamp.
  */
class LakeMergeSpec extends SparkSuite {
  import spark.implicits._

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def corpus(tag: String, parts: Seq[String], rows: Int = 20) =
    parts.flatMap(p => (0 until rows)
      .map(j => (s"$p-$j", p, s"$tag $p $j")))
      .toDF("id", "k", "text")

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_lakemerge").toString + "/lake"

  private def readAll(root: String,
      v: Option[Long] = None): Set[(String, String, String)] =
    Lake.readVersion(spark, root, v).select("id", "k", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  private def files(dir: String): Map[String, Long] = {
    val fs = fsOf(dir)
    if (!fs.exists(new Path(dir))) return Map.empty
    val it = fs.listFiles(new Path(dir), true)
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) { val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        b += (st.getPath.toString -> st.getModificationTime) }
    b.result()
  }

  test("mergeDelta: upsert replaces, delete removes, insert adds (new key " +
      "and new partition); untouched partitions inherit zero-copy; pinned " +
      "base intact; physical payload is the touched partitions only") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0", "g1", "g2")), root,
        Seq("k"), Seq("id"), 1000L) // v0
      val base = readAll(root)
      val g0Before = files(s"$root/v=0/k=g0")

      val changes = Seq(
        ("g1-0", "g1", "edited g1 0", "upsert"), // replace
        ("g1-1", "g1", null, "delete"), // remove
        ("g1-99", "g1", "born g1 99", "upsert"), // new key, old partition
        ("g3-0", "g3", "born g3 0", "upsert"), // new partition
        ("gX-0", "g2", null, "delete") // delete of an absent key: no-op
      ).toDF("id", "k", "text", "op")
      val v1 = Lake.mergeDelta(changes, root, Seq("id"), Seq("k"),
        Seq("id"), 1000L)
      assert(v1 === 1L)

      val cur = readAll(root)
      val expected = base -- Set(
        ("g1-0", "g1", "base g1 0"), ("g1-1", "g1", "base g1 1")) ++ Set(
        ("g1-0", "g1", "edited g1 0"), ("g1-99", "g1", "born g1 99"),
        ("g3-0", "g3", "born g3 0"))
      assert(cur === expected)

      // physical payload of v=1: the touched partitions (g1, g2, g3)
      // only — g0 is inherited, its v=0 bytes untouched in place
      val fs = fsOf(root)
      assert(fs.exists(new Path(root, "v=1/k=g1")))
      assert(fs.exists(new Path(root, "v=1/k=g3")))
      assert(!fs.exists(new Path(root, "v=1/k=g0")),
        "untouched partition was copied into the merge generation")
      assert(files(s"$root/v=0/k=g0") === g0Before)
      // pinned time travel reproduces the pre-merge corpus exactly
      assert(readAll(root, Some(0L)) === base)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a partition deleted empty vanishes from the merged generation " +
      "and stays gone under later deltas") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0", "g1"), rows = 3), root,
        Seq("k"), Seq("id"), 1000L) // v0
      // delete every g1 row — the partition must NOT be inherited back
      val wipe = (0 until 3).map(j => (s"g1-$j", "g1",
        null: String, "delete")).toDF("id", "k", "text", "op")
      Lake.mergeDelta(wipe, root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      val cur = readAll(root)
      assert(cur.forall(_._2 == "g0"), cur.toString)
      assert(cur.size === 3)
      // the wipe survives a later unrelated delta (refs were flattened
      // without the dropped partition)
      Lake.publishDelta(corpus("d", Seq("g0"), rows = 3), root,
        Seq("k"), Seq("id"), 1000L)
      assert(readAll(root).forall(t => t._2 == "g0" && t._3.startsWith("d")))
      // pinned pre-wipe read still sees g1
      assert(readAll(root, Some(0L)).count(_._2 == "g1") === 3)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("seqCol nets the changelog to the latest action per key; an op " +
      "outside upsert|delete fails loudly") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0"), rows = 2), root,
        Seq("k"), Seq("id"), 1000L)
      // g0-0: upsert@1 then delete@2 → net delete; g0-1: delete@1 then
      // upsert@2 → net upsert (the CDC resurrection shape)
      val log = Seq(
        ("g0-0", "g0", "stale edit", "upsert", 1L),
        ("g0-0", "g0", null, "delete", 2L),
        ("g0-1", "g0", null, "delete", 1L),
        ("g0-1", "g0", "reborn", "upsert", 2L)
      ).toDF("id", "k", "text", "op", "seq")
      Lake.mergeDelta(log, root, Seq("id"), Seq("k"), Seq("id"), 1000L,
        seqCol = Some("seq"))
      assert(readAll(root) === Set(("g0-1", "g0", "reborn")))

      val bad = Seq(("g0-1", "g0", "x", "UPSERT"))
        .toDF("id", "k", "text", "op")
      val e = intercept[Exception] {
        Lake.mergeDelta(bad, root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      }
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("\n")
      assert(chain.contains("upsert|delete"), chain)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("partition-stability contract: a moved key leaves its old copy " +
      "under the default; probeMovers=true widens the touched set and " +
      "removes it") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0", "g1"), rows = 2), root,
        Seq("k"), Seq("id"), 1000L)
      // key g0-0 "moves" to partition g1: the changelog names g1 only
      val move = Seq(("g0-0", "g1", "moved", "upsert"))
        .toDF("id", "k", "text", "op")
      Lake.mergeDelta(move, root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      // default: the old g0 copy is stale-but-present (the documented
      // contract violation a caller must not commit)
      val dup = readAll(root).filter(_._1 == "g0-0")
      assert(dup === Set(("g0-0", "g0", "base g0 0"), ("g0-0", "g1", "moved")))

      // probeMovers finds the g0 holder and merges it away
      Lake.mergeDelta(move, root, Seq("id"), Seq("k"), Seq("id"), 1000L,
        probeMovers = true)
      assert(readAll(root).filter(_._1 == "g0-0") ===
        Set(("g0-0", "g1", "moved")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("mergeBatch is exactly-once on batch id across replay crash " +
      "windows; chained merges compose with rollback") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0", "g1"), rows = 2), root,
        Seq("k"), Seq("id"), 1000L) // v0
      def m(id: String, part: String, text: String, batchId: Long): Unit =
        Lake.mergeBatch(Seq((id, part, text, "upsert"))
            .toDF("id", "k", "text", "op"),
          root, Seq("id"), Seq("k"), Seq("id"), 1000L, keep = 10,
          opCol = "op", seqCol = None, batchId = batchId)
      m("g0-0", "g0", "b0 edit", batchId = 0L) // v1
      assert(readAll(root).contains(("g0-0", "g0", "b0 edit")))
      // plain replay with different data: nothing republishes
      m("g0-0", "g0", "SHOULD NOT LAND", batchId = 0L)
      assert(Lake.publishedHighWater(spark, root).contains(1L))
      assert(readAll(root).contains(("g0-0", "g0", "b0 edit")))
      // between-flips crash: stamp at high-water, pointer behind — the
      // replay only re-points
      val fs = fsOf(root)
      val os = fs.create(new Path(root, "_CURRENT"), true)
      os.write("0".getBytes("UTF-8")); os.close()
      m("g0-0", "g0", "SHOULD NOT LAND", batchId = 0L)
      assert(Lake.currentVersion(spark, root).contains(1L))
      assert(readAll(root).contains(("g0-0", "g0", "b0 edit")))
      // next batch merges on top; rollback un-ships it in O(1)
      m("g1-0", "g1", "b1 edit", batchId = 1L) // v2
      assert(readAll(root).contains(("g1-0", "g1", "b1 edit")))
      Lake.rollbackTo(spark, root, 1L)
      assert(!readAll(root).contains(("g1-0", "g1", "b1 edit")))
      assert(readAll(root).contains(("g0-0", "g0", "b0 edit")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("the merge's base read is partition-pruned: bytes read track the " +
      "touched partition, not the corpus") {
    val root = tmp()
    try {
      // g0 tiny (20 rows), g1 deliberately heavy (20k rows of long text)
      val heavy = (0 until 20000).map(j =>
        (s"g1-$j", "g1", ("lorem ipsum " * 40) + j)).toDF("id", "k", "text")
      Lake.publishVersion(
        corpus("base", Seq("g0")).unionByName(heavy), root,
        Seq("k"), Seq("id"), 1000000L)
      val g1Bytes = files(s"$root/v=0/k=g1").keys.map(p =>
        fsOf(root).getFileStatus(new Path(p)).getLen).sum
      val read = bytesReadDuring {
        val ch = Seq(("g0-0", "g0", "edit", "upsert"))
          .toDF("id", "k", "text", "op")
        Lake.mergeDelta(ch, root, Seq("id"), Seq("k"), Seq("id"), 1000000L)
      }
      // the merge touched g0 only: its scans must not have read the
      // heavy partition (half its bytes is already far more than every
      // g0 file + changelog + metadata read together)
      assert(read < g1Bytes / 2,
        s"merge read $read bytes; untouched g1 holds $g1Bytes")
      assert(readAll(root).count(_._2 == "g1") === 20000)
      assert(readAll(root).contains(("g0-0", "g0", "edit")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("pruning holds for a NON-STRING partition column (the literal is " +
      "cast to the column type, keeping the attr = literal shape)") {
    val root = tmp()
    try {
      // bucket 0 tiny, bucket 1 heavy — long-typed partition column
      val tiny = (0 until 10).map(j => (s"a-$j", 0L, s"t $j"))
      val heavy = (0 until 20000).map(j =>
        (s"b-$j", 1L, ("lorem ipsum " * 40) + j))
      Lake.publishVersion((tiny ++ heavy).toDF("id", "bucket", "text"),
        root, Seq("bucket"), Seq("id"), 1000000L)
      val b1Bytes = files(s"$root/v=0/bucket=1").keys.map(p =>
        fsOf(root).getFileStatus(new Path(p)).getLen).sum
      val read = bytesReadDuring {
        Lake.mergeDelta(
          Seq(("a-0", 0L, "edit", "upsert")).toDF("id", "bucket", "text", "op"),
          root, Seq("id"), Seq("bucket"), Seq("id"), 1000000L)
      }
      assert(read < b1Bytes / 2,
        s"merge read $read bytes; untouched bucket=1 holds $b1Bytes")
      val out = Lake.readVersion(spark, root)
      assert(out.filter(col("bucket") === 0L && col("id") === "a-0")
        .select("text").collect().map(_.getString(0)).toSeq === Seq("edit"))
      assert(out.count() === 20010L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("a changelog missing a base column fails loudly (an upsert " +
      "replaces the WHOLE row); fillMissing opts into null-fill; " +
      "delete-only changelogs are exempt") {
    val root = tmp()
    try {
      Lake.publishVersion(
        corpus("base", Seq("g0"), rows = 2).withColumn("score", lit(0.5)),
        root, Seq("k"), Seq("id"), 1000L)
      // upsert lacking `score` would silently null it — loud by default
      val ch = Seq(("g0-0", "g0", "edit", "upsert"))
        .toDF("id", "k", "text", "op")
      val e = intercept[IllegalArgumentException] {
        Lake.mergeDelta(ch, root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      }
      assert(e.getMessage.contains("'score'"), e.getMessage)
      // a delete-only changelog writes no payload: exempt
      Lake.mergeDelta(
        Seq(("g0-1", "g0", "x", "delete")).toDF("id", "k", "text", "op"),
        root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      assert(readAll(root) === Set(("g0-0", "g0", "base g0 0")))
      // explicit opt-in null-fills
      Lake.mergeDelta(ch, root, Seq("id"), Seq("k"), Seq("id"), 1000L,
        fillMissing = true)
      val out = Lake.readVersion(spark, root)
        .select("id", "text", "score").collect()
        .map(r => (r.getString(0), r.getString(1),
          Option(r.get(2)))).toSet
      assert(out === Set(("g0-0", "edit", None)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("composite keys: the merge anti-joins and nets on ALL key columns") {
    val root = tmp()
    try {
      val base = Seq(
        ("u1", 1L, "g0", "a"), ("u1", 2L, "g0", "b"),
        ("u2", 1L, "g0", "c"), ("u2", 1L, "g1", "d"))
        .toDF("user", "slot", "k", "text")
      Lake.publishVersion(base, root, Seq("k"), Seq("user"), 1000L)
      // (u1,1) replaced; (u2,1) in g0 deleted — the SAME (user,slot) in
      // g1 must survive (partition is not part of the key, but the
      // changelog row names its partition); netting orders by seq on the
      // composite key
      val log = Seq(
        ("u1", 1L, "g0", "stale", "upsert", 1L),
        ("u1", 1L, "g0", "A2", "upsert", 2L),
        ("u2", 1L, "g0", null, "delete", 1L))
        .toDF("user", "slot", "k", "text", "op", "seq")
      Lake.mergeDelta(log, root, Seq("user", "slot"), Seq("k"),
        Seq("user"), 1000L, seqCol = Some("seq"))
      val cur = Lake.readVersion(spark, root)
        .select("user", "slot", "k", "text").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getString(3))).toSet
      assert(cur === Set(
        ("u1", 1L, "g0", "A2"), ("u1", 2L, "g0", "b"),
        ("u2", 1L, "g1", "d")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("additive schema drift: an upsert carrying a new column merges; " +
      "survivors and inherited partitions read it as NULL") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base", Seq("g0", "g1"), rows = 2), root,
        Seq("k"), Seq("id"), 1000L)
      val wide = Seq(("g0-0", "g0", "scored", "upsert", 0.9))
        .toDF("id", "k", "text", "op", "score")
      Lake.mergeDelta(wide, root, Seq("id"), Seq("k"), Seq("id"), 1000L)
      val out = Lake.readVersion(spark, root)
      assert(out.columns.toSet === Set("id", "k", "text", "score"))
      val scored = out.filter(col("score").isNotNull)
        .select("id").as[String].collect().toSeq
      assert(scored === Seq("g0-0"))
      assert(out.count() === 4L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }
}
