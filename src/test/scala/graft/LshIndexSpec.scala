package graft

import java.nio.file.{Files, Path}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import graft.operators.{LshIndex, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted-index lifecycle claims, proven across TWO ingest cycles:
  *
  *  1. each ingest's pairs equal the full-batch pair set over everything
  *     indexed so far, restricted to pairs touching that ingest's batch;
  *  2. settled index files are BYTE-IDENTICAL across ingests — an ingest
  *     appends new bucket files, it never rewrites history;
  *  3. per-ingest index-write volume is O(new): the appended files hold
  *     exactly the new batch's band rows, not the corpus's.
  */
class LshIndexSpec extends SparkSuite {

  // settled base + two ingest batches, with synthesized near-dups placed
  // so that every ingest finds pairs against BOTH the settled corpus and
  // (for batch 2) the previously-ingested batch: copies of every 30th
  // base doc under high ids, shifted by +600001 / +600002 so the copies
  // land in batch 1 / batch 2 (originals are doc_id % 3 == 0 → base).
  private def corpus(): DataFrame = {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") % 3 === 0).limit(200)
    val dups = d.filter(col("doc_id") % 30 === 0)
    d.union(dups.select((col("doc_id") + 600001L).as("doc_id"), col("text")))
      .union(dups.select((col("doc_id") + 600002L).as("doc_id"), col("text")))
      // pin the limit(200) sample: the lifecycle reads and the full-batch
      // recompute must see the identical fixture
      .localCheckpoint()
  }

  private def batchOf(df: DataFrame, r: Int): DataFrame =
    df.filter(col("doc_id") % 3 === r)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Net-live tombstoned ids — the delta log's observable state. */
  private def liveIds(table: String): Set[Long] =
    LshIndex.liveTombstones(spark, table)
      .map(_.select("doc_id").collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)

  private def parquetFiles(dir: Path): Map[String, String] = {
    val md = MessageDigest.getInstance("MD5")
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map { p =>
        md.reset()
        p.toString -> md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  test("two-ingest lifecycle: per-ingest identity, byte-identical settled " +
    "files, O(new) write volume") {
    val all = corpus() // stable fixture across reads
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val b2 = batchOf(all, 2)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec")
    val table = "lsh_lifecycle_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)

      // ---- ingest 1: probe pairs ≡ full pairs over (base ∪ b1) touching b1
      val pairs1 = pairSet(
        LshIndex.ingest(spark, table, b1, all, "doc_id", "text"))
      val full1 = pairSet(
        TextDedup.minhashLshPairs(base.union(b1), "doc_id", "text"))
        .filter(p => p._1 % 3 == 1 || p._2 % 3 == 1)
      assert(full1.nonEmpty, "fixture must produce pairs touching batch 1")
      assert(pairs1 === full1)

      val afterIngest1 = parquetFiles(idxDir)
      assert(afterIngest1.nonEmpty)

      // ---- ingest 2: identity over everything indexed so far
      val pairs2 = pairSet(
        LshIndex.ingest(spark, table, b2, all, "doc_id", "text"))
      val full2 = pairSet(TextDedup.minhashLshPairs(all, "doc_id", "text"))
        .filter(p => p._1 % 3 == 2 || p._2 % 3 == 2)
      assert(full2.nonEmpty, "fixture must produce pairs touching batch 2")
      assert(pairs2 === full2)
      // batch 2's copies pair against batch 1's copies of the same
      // original — the cross-INGEST case only the persisted index covers
      assert(pairs2.exists(p => p._1 % 3 == 1 && p._2 % 3 == 2),
        "fixture must produce a batch1 × batch2 pair")

      // ---- settled files byte-identical: every ingest-1 file survives
      // ingest 2 unmodified; ingest 2 only ADDS files
      val afterIngest2 = parquetFiles(idxDir)
      val rewritten = afterIngest1.filter { case (path, sum) =>
        afterIngest2.get(path) != Some(sum)
      }
      assert(rewritten.isEmpty,
        s"ingest 2 rewrote settled index files: ${rewritten.keys}")
      val newFiles = (afterIngest2.keySet -- afterIngest1.keySet).toSeq
      assert(newFiles.nonEmpty, "ingest 2 must append new index files")

      // ---- O(new) write volume: the appended files hold exactly batch
      // 2's band rows (bands × |docs with ≥1 shingle|), not the corpus's
      val appended = spark.read.parquet(newFiles: _*).count()
      val expected = LshIndex.bandRows(b2, "doc_id", "text").count()
      assert(appended === expected,
        s"appended $appended rows, batch-2 band rows = $expected")
      assert(appended < spark.table(table).count(),
        "appended volume must be a strict subset of the index")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("append without probe grows the index; probe without append " +
    "leaves it untouched") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec2")
    val table = "lsh_lifecycle_spec2"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      val n0 = spark.table(table).count()
      val before = parquetFiles(idxDir)

      // probe is read-only: same pairs as ingest WITHOUT the new×new
      // self-pairs of the batch... (batch 1 vs index = new×old only)
      val probed = pairSet(
        LshIndex.probe(spark, table, b1, all, "doc_id", "text"))
      assert(parquetFiles(idxDir) === before, "probe must not write")
      assert(spark.table(table).count() === n0)
      val full1 = pairSet(
        TextDedup.minhashLshPairs(base.union(b1), "doc_id", "text"))
      val newOld = full1.filter(p =>
        (p._1 % 3 == 1) != (p._2 % 3 == 1)) // exactly one side new
      assert(probed === newOld)

      // append is write-only: index grows by the batch's band rows
      LshIndex.append(spark, table, b1, "doc_id", "text")
      val expected = LshIndex.bandRows(b1, "doc_id", "text").count()
      assert(spark.table(table).count() === n0 + expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("probe fails loudly when the index holds an id the store cannot " +
    "resolve (drift), instead of silently dropping its pairs") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec4")
    val table = "lsh_drifted_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      // drift: the store lost a settled doc that IS paired by the probe —
      // drop the originals of the planted dups (doc_id % 30 == 0 in base)
      val drifted = all.filter(!(col("doc_id") % 30 === 0
        && col("doc_id") < 600000L))
      val e = intercept[Exception] {
        LshIndex.probe(spark, table, b1, drifted, "doc_id", "text").count()
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("not the doc store"))),
        s"expected the drift raise_error, got: $e")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("remove: logical deletes — zero index I/O, probe skips tombstoned " +
    "pairs instead of raising drift, rebuild clears the tombstones") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec5")
    val table = "lsh_remove_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      val before = parquetFiles(idxDir)
      // delete the planted originals from store AND index — the CDC
      // delete batch. Without the remove, probing against the shrunken
      // store raises the drift error (previous test); with it, the
      // tombstoned pairs are skipped and everything else survives.
      val victims = base.filter(col("doc_id") % 30 === 0)
        .select("doc_id").localCheckpoint()
      val victimIds = victims.collect().map(_.getLong(0)).toSet
      assert(victimIds.nonEmpty)
      LshIndex.remove(spark, table, victims)
      // zero index I/O: the delete wrote only tombstones
      assert(parquetFiles(idxDir) === before,
        "remove must not touch index files")
      val store = all.join(victims, Seq("doc_id"), "left_anti")
      val probed = pairSet(
        LshIndex.probe(spark, table, b1, store, "doc_id", "text"))
      val full = pairSet(
        TextDedup.minhashLshPairs(base.union(b1), "doc_id", "text"))
        .filter(p => (p._1 % 3 == 1) != (p._2 % 3 == 1))
      val expected = full.filterNot(p =>
        victimIds.contains(p._1) || victimIds.contains(p._2))
      assert(probed === expected)
      assert(probed.size < full.size,
        "fixture must tombstone at least one would-be pair")
      // the next build is the compaction: tombstones are spent
      LshIndex.build(store.filter(col("doc_id") % 3 === 0), "doc_id",
        "text", s"$idxDir/index2", table)
      assert(!spark.catalog.tableExists(LshIndex.tombstoneTable(table)),
        "rebuild must clear the tombstone table")
      // remove refuses a table build() never produced
      spark.sql(s"DROP TABLE IF EXISTS $table")
      intercept[Exception] {
        LshIndex.remove(spark, table, victims)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${LshIndex.tombstoneTable(table)}")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("compact: physical tombstone compaction from the index's own rows " +
    "— tombstones spent, dead rows gone, probes identical, lifecycle " +
    "continues") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec6")
    val table = "lsh_compact_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      // tombstone only HALF the planted originals (%60, not %30): the
      // surviving %30 originals keep producing probe pairs, so the
      // pre/post-compact equality below compares NONEMPTY sets
      val victims = base.filter(col("doc_id") % 60 === 0)
        .select("doc_id").localCheckpoint()
      val nVictims = victims.count()
      assert(nVictims > 0)
      LshIndex.remove(spark, table, victims)
      val store = all.join(victims, Seq("doc_id"), "left_anti")
      val preCompact = pairSet(
        LshIndex.probe(spark, table, b1, store, "doc_id", "text"))
      assert(preCompact.nonEmpty,
        "fixture must keep at least one surviving probe pair")
      val rowsBefore = spark.table(table).count()

      LshIndex.compact(spark, table)

      // tombstones spent (net-zero in the append-only delta log — the log
      // itself is never rewritten or dropped outside build()); dead band
      // rows physically gone (bands = 4 rows per tombstoned doc); probe
      // results identical without the anti-join; k/bands/buckets metadata
      // preserved so the lifecycle (ingest) continues on the compacted
      // generation
      assert(liveIds(table).isEmpty,
        "compact must retire the applied tombstones to net-zero")
      assert(spark.table(table).count() === rowsBefore - 4 * nVictims,
        "compact must drop exactly the tombstoned docs' band rows")
      val postCompact = pairSet(
        LshIndex.probe(spark, table, b1, store, "doc_id", "text"))
      assert(postCompact === preCompact,
        "compaction changed probe results")
      // crash-window heal: simulate dying between the old generation's
      // DROP and the staged generation's RENAME (catalog state = live
      // table gone, staging table complete) — the next compact() finishes
      // the swap instead of failing table-not-found
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}_compacting")
      LshIndex.compact(spark, table)
      assert(spark.catalog.tableExists(table) &&
        !spark.catalog.tableExists(s"${table}_compacting"))
      assert(pairSet(LshIndex.probe(spark, table, b1, store, "doc_id",
        "text")) === preCompact, "healed compaction changed probe results")

      // repeated compaction ping-pongs the generation path, no growth
      LshIndex.compact(spark, table)
      assert(pairSet(LshIndex.probe(spark, table, b1, store, "doc_id",
        "text")) === preCompact)

      val ingestedSet = pairSet(LshIndex.ingest(spark, table, b1,
        store.union(b1).distinct(), "doc_id", "text"))
      // ingest = probe's new×old pairs PLUS any new×new pairs the append
      // makes visible — the new×old restriction must match the probe
      assert(ingestedSet.filter(p =>
        !(p._1 >= 600000L && p._2 >= 600000L)) === preCompact,
        "post-compact ingest's new×old pairs must equal the probe's")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${LshIndex.tombstoneTable(table)}")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("compact: a remove() landing mid-compaction (after the tombstone " +
    "snapshot) survives the swap — tombstone kept, pairs excluded, " +
    "retired physically by the NEXT compact") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec7")
    val table = "lsh_race_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      // victims applied by the compaction: half the planted originals
      val applied = base.filter(col("doc_id") % 60 === 0)
        .select("doc_id").localCheckpoint()
      assert(applied.count() > 0)
      LshIndex.remove(spark, table, applied)
      // the LATE victims: the other half of the originals (still paired),
      // removed mid-compaction via the injection seam — after the
      // snapshot, before the swap. Pre-fix, compact's wholesale tombstone
      // DROP discarded them and their pairs resurrected in probes.
      val late = base.filter(col("doc_id") % 60 === 30)
        .select("doc_id").localCheckpoint()
      val lateIds = late.collect().map(_.getLong(0)).toSet
      assert(lateIds.nonEmpty, "fixture needs late victims with pairs")
      LshIndex.afterTombSnapshotHook =
        () => LshIndex.remove(spark, table, late)
      try LshIndex.compact(spark, table)
      finally LshIndex.afterTombSnapshotHook = () => ()
      // the late remove survived: the delta log's net-live set is EXACTLY
      // the late ids (the applied ones were retired to net-zero)
      val tt = LshIndex.tombstoneTable(table)
      assert(spark.catalog.tableExists(tt),
        "compact discarded a concurrent remove")
      assert(liveIds(table) === lateIds)
      // probes exclude the late victims' pairs
      val store = all.join(applied, Seq("doc_id"), "left_anti")
        .join(late, Seq("doc_id"), "left_anti")
      val probed = pairSet(
        LshIndex.probe(spark, table, b1, store, "doc_id", "text"))
      assert(probed.forall(p =>
        !lateIds.contains(p._1) && !lateIds.contains(p._2)),
        "a mid-compaction remove resurrected its pairs")
      // and the NEXT compact retires them physically
      val rowsBefore = spark.table(table).count()
      LshIndex.compact(spark, table)
      assert(liveIds(table).isEmpty)
      assert(spark.table(table).count() === rowsBefore - 4 * lateIds.size)
      assert(pairSet(LshIndex.probe(spark, table, b1, store, "doc_id",
        "text")) === probed, "second compaction changed probe results")
    } finally {
      LshIndex.afterTombSnapshotHook = () => ()
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${LshIndex.tombstoneTable(table)}")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("compact: a remove() landing DURING the retire step survives " +
    "without a single-writer slot — appends to the delta log commute " +
    "with the retire's negated markers") {
    val all = corpus()
    val base = batchOf(all, 0)
    val b1 = batchOf(all, 1)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec8")
    val table = "lsh_retire_race_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      val applied = base.filter(col("doc_id") % 60 === 0)
        .select("doc_id").localCheckpoint()
      val appliedIds = applied.collect().map(_.getLong(0)).toSet
      assert(appliedIds.nonEmpty)
      LshIndex.remove(spark, table, applied)
      // the race payload: fresh victims (the other originals) PLUS a
      // RE-REMOVE of one doc the retire is retiring at that very moment —
      // the pre-r13 rewrite design's unsurvivable interleaving (the
      // rewrite would overwrite the re-remove's row)
      val late = base.filter(col("doc_id") % 60 === 30)
        .select("doc_id").localCheckpoint()
      val lateIds = late.collect().map(_.getLong(0)).toSet
      assert(lateIds.nonEmpty)
      val reRemoved = appliedIds.min
      import spark.implicits._
      LshIndex.beforeTombRetireHook = () => {
        LshIndex.remove(spark, table, late)
        LshIndex.remove(spark, table, Seq(reRemoved).toDF("doc_id"))
      }
      try LshIndex.compact(spark, table)
      finally LshIndex.beforeTombRetireHook = () => ()
      // every mid-retire remove is net-live; every applied victim except
      // the re-removed one nets to zero
      assert(liveIds(table) === lateIds + reRemoved,
        "the retire step lost a concurrent remove")
      // probes exclude the late victims' pairs
      val store = all.join(applied, Seq("doc_id"), "left_anti")
        .join(late, Seq("doc_id"), "left_anti")
      val probed = pairSet(
        LshIndex.probe(spark, table, b1, store, "doc_id", "text"))
      assert(probed.forall(p =>
        !lateIds.contains(p._1) && !lateIds.contains(p._2)),
        "a mid-retire remove resurrected its pairs")
      // the next compact applies the late victims (and the re-removed
      // doc's no-op — its band rows are already gone) and retires all
      val rowsBefore = spark.table(table).count()
      LshIndex.compact(spark, table)
      assert(liveIds(table).isEmpty)
      assert(spark.table(table).count() === rowsBefore - 4 * lateIds.size)
      assert(pairSet(LshIndex.probe(spark, table, b1, store, "doc_id",
        "text")) === probed, "follow-up compaction changed probe results")
    } finally {
      LshIndex.beforeTombRetireHook = () => ()
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${LshIndex.tombstoneTable(table)}")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("tombstone-log memo: steady state after compact is None (no " +
    "per-probe log aggregate); a fresh remove re-arms it") {
    val all = corpus()
    val base = batchOf(all, 0)
    val idxDir = Files.createTempDirectory("graft_lshidx_spec7")
    val table = "lsh_memo_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      LshIndex.build(base, "doc_id", "text", s"$idxDir/index", table)
      // no log at all → None
      assert(LshIndex.liveTombstones(spark, table).isEmpty)
      val victims = base.filter(col("doc_id") % 60 === 0)
        .select("doc_id").localCheckpoint()
      assert(victims.count() > 0)
      LshIndex.remove(spark, table, victims)
      // live removes → Some (the anti-join must run)
      assert(LshIndex.liveTombstones(spark, table).isDefined)
      LshIndex.compact(spark, table)
      // steady state: the log still EXISTS (append-only, never dropped
      // outside build) but nets to empty — the memo must collapse this to
      // None so probes pay a listing, not a Spark job, per call
      assert(spark.catalog.tableExists(LshIndex.tombstoneTable(table)))
      assert(LshIndex.liveTombstones(spark, table).isEmpty)
      assert(LshIndex.liveTombstones(spark, table).isEmpty) // memo hit
      // a NEW remove appends a file → fingerprint changes → re-armed
      val again = base.filter(col("doc_id") % 90 === 30)
        .select("doc_id").localCheckpoint()
      assert(again.count() > 0)
      LshIndex.remove(spark, table, again)
      val live = LshIndex.liveTombstones(spark, table)
      assert(live.isDefined)
      val ids = live.get.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === again.collect().map(_.getLong(0)).toSet)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${LshIndex.tombstoneTable(table)}")
      org.apache.commons.io.FileUtils.deleteDirectory(idxDir.toFile)
    }
  }

  test("append/probe refuse a table not built by LshIndex.build") {
    val wh = Files.createTempDirectory("graft_lshidx_spec3")
    val table = "lsh_not_an_index"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      spark.range(10).selectExpr("id AS doc_id", "CAST(id AS STRING) AS ikey")
        .write.option("path", s"$wh/t").saveAsTable(table)
      val docs = spark.range(5).selectExpr(
        "id AS doc_id", "'alpha beta gamma' AS text")
      val e = intercept[IllegalStateException] {
        LshIndex.append(spark, table, docs, "doc_id", "text")
      }
      assert(e.getMessage.contains("not bucketed") ||
        e.getMessage.contains("graft.lsh"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      org.apache.commons.io.FileUtils.deleteDirectory(wh.toFile)
    }
  }
}
