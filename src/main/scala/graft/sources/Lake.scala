package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-corpus publishing — the write-side discipline of a 100 TB
  * pipeline (the read/analyze/dedup operators' output has to land
  * somewhere a training run can consume it efficiently):
  *
  *  - **partition layout**: one directory per `partitionCols` value
  *    (consumers prune whole partitions — the split/lang dirs a data
  *    loader filters on);
  *  - **bounded file sizes**: `maxRecordsPerFile` caps every file — no
  *    giant single-task file, no unsplittable hot spot;
  *  - **in-file ordering**: rows sorted by `sortCols` inside each file
  *    (zone-map/rowgroup pruning on the dominant read predicate — the
  *    same layout quality `q26_zorder` measures);
  *  - **one task per partition dir** (`repartition(partitionCols)`)
  *    so file count ≈ ceil(rows / maxRecordsPerFile) per partition, not
  *    × input tasks.
  *
  * Returns a per-partition manifest (file count, row count, byte volume)
  * read back from what actually landed — the accounting a downstream
  * loader checks before training. `LakeSpec` pins: row-cap respected per
  * file, in-file ordering, manifest totals ≡ input.
  */
object Lake {

  /** Thrown when a FULL publish produced zero data files (empty input, or
    * every row quarantined by drop-mode expectations) — an empty full
    * generation is unreadable, so the pointer stays on the prior version.
    * A dedicated type (r16 advice): [[publishStream]]'s drop-mode
    * poison-batch skip catches THIS, not a message substring, so rewording
    * the message can never silently revert a drop-mode stream to replaying
    * the poison batch forever. Extends IllegalArgumentException to keep
    * any pre-r17 caller's catch working. */
  final class RefusedPublishException(msg: String)
    extends IllegalArgumentException(msg)

  def writeCurated(
      df: DataFrame,
      outDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Long): DataFrame = {
    writeLayout(df, outDir, partitionCols, sortCols, maxRecordsPerFile)
    manifest(df.sparkSession, outDir, partitionCols)
  }

  /** The layout write alone (no manifest read-back): the shared write
    * path of [[writeCurated]] and [[publishVersion]] — the latter must
    * not silently pay a full generation scan per publish just to discard
    * the accounting ([[manifest]] counts rows by READING them; call it
    * explicitly when the accounting is wanted).
    */
  private def writeLayout(
      df: DataFrame,
      outDir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Long,
      zOrderCols: Seq[String] = Nil,
      bloomFilterCols: Seq[String] = Nil): Unit = {
    // z-clustering rides the same single write pass: the z-value is a
    // pure projection (quantile buckets from one approx pass, bits
    // interleaved), the in-file sort uses it, and the projection after
    // the sort drops it — ordering is preserved (the optimizer cannot
    // push a projection that removes a sort key below its Sort), so the
    // persisted files carry no layout column, only the row-group
    // min/max selectivity the sort created
    val (d, sort) =
      if (zOrderCols.isEmpty) (df, partitionCols ++ sortCols)
      else (graft.operators.ZOrder.withZ(df, zOrderCols),
        (partitionCols ++ sortCols) :+ "_graft_z")
    val sorted = d.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(sort.map(col): _*)
    val w0 = (if (zOrderCols.isEmpty) sorted else sorted.drop("_graft_z"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    // parquet bloom filters give point lookups row-group skipping on
    // columns min/max stats can't help with (high-cardinality ids in
    // hash order): the reader consults the bloom before decoding the
    // group. A per-column writer option — storage cost is the filter
    // bitset per (column, row group), paid only where asked for. The
    // expected NDV is sized from the writer's own per-file row cap:
    // unset, parquet-mr allocates its MAXIMUM bitset (1 MB per chunk),
    // which at small file sizes costs more bytes than the data it skips
    val w = bloomFilterCols.foldLeft(w0)((acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          maxRecordsPerFile.toString))
    w.partitionBy(partitionCols: _*).parquet(outDir)
  }

  // ------------------------------------------------------------------
  // Versioned publishing (MVCC-lite): immutable generations + an atomic
  // pointer. [[graft.GenSwap]] mutates a directory in place with per-leaf
  // atomicity, which leaves two unavoidable reader races (absent-leaf
  // window, listed-then-moved files). This surface closes both, the way
  // a log-structured table format does, with one tiny piece of metadata:
  //
  //  - every [[publishVersion]] writes a COMPLETE generation under
  //    `root/v=<n>/` (the [[writeCurated]] layout inside) and only then
  //    flips `root/_CURRENT` via tmp-write + atomic rename;
  //  - a published generation is IMMUTABLE — nothing inside it is ever
  //    renamed, rewritten, or deleted while inside the retention horizon,
  //    so a reader that resolved the pointer scans frozen files: no
  //    torn reads, no vanished files, however long the scan runs;
  //  - [[rollbackTo]] is one pointer flip (O(1) — the operational win of
  //    versioning: a bad curation run un-ships instantly);
  //  - retention keeps the last `keep` generations; pruning deletes only
  //    generations `≤ published − keep`, so any reader within the horizon
  //    is safe (the standard MVCC-vacuum contract — size `keep` to the
  //    longest consumer).
  //
  // Crash safety (single writer per root, as with every maintenance
  // pass). TWO pointers, each flipped via tmp-write + rename:
  //
  //  - `_CURRENT` — what readers resolve;
  //  - `_HIGH` — the published high-water mark: the largest version whose
  //    generation write COMPLETED and whose publish committed. It is
  //    flipped to `next` immediately before `_CURRENT`, so at every
  //    instant `v ≤ max(_HIGH, _CURRENT)` ⇔ "v's data is complete" —
  //    which is exactly the predicate orphan cleanup and pinned reads
  //    need. Versions are allocated monotonically above the high-water,
  //    so a rollback never causes number reuse, and a rolled-back-over
  //    generation stays pinned-readable until retention prunes it (it
  //    WAS published; a consumer may still be mid-scan on it).
  //
  // The crash windows, exhaustively:
  //  - before `_HIGH` flips: `v=<next>` is an orphan above the high-water
  //    — the next publish deletes it (readers never saw it: they resolve
  //    pointers, and both still point below it);
  //  - between the `_HIGH` and `_CURRENT` flips: `v=<next>` is complete
  //    and counted published, but never became current — it remains
  //    pinned-readable, the next publish allocates above it; harmless;
  //  - mid-flip (the generic FileSystem rename cannot clobber, so each
  //    flip is delete-then-rename): the pointer file is briefly absent
  //    but `._<name>.tmp` — written BEFORE the delete — holds the new
  //    value for the whole window. Readers fall back to the tmp, and the
  //    writer completes the interrupted rename before its next
  //    publish/rollback ([[recoverPointers]]). The one residual hazard —
  //    a pointer lost by means OUTSIDE the protocol (manual delete, FS
  //    corruption) — recovers by adopting the highest on-disk generation
  //    rather than ever treating a populated root as empty: orphan
  //    cleanup is NOT allowed to run when the pointer state is
  //    irrecoverable, so no crash shape wipes published history.
  //
  // The pointer files are underscore-named, so no Spark listing ever
  // sees them; generation dirs use the `v=<n>` partition-dir convention,
  // so reading the ROOT (rather than one generation) is also
  // well-defined — the full history with `v` as a column — though
  // [[readVersion]] is the consumer API.
  //
  // At 100 TB the cost over in-place curation is storage for `keep`
  // generations — the price every versioned lake pays; publish cost is
  // the same one corpus write, and the pointer adds one ~10-byte file.
  // ------------------------------------------------------------------

  private val CurrentPointer = "_CURRENT"
  private val HighPointer = "_HIGH"
  private val BatchMarker = "_BATCH"
  private val RefsManifest = "_REFS"

  /** A delta generation's inheritance manifest: one `relLeafDir\towner`
    * line per partition dir inherited (by reference, no copy) from an
    * older generation. References are FLATTENED at publish — the owner
    * is always the generation that physically holds the dir — so
    * resolution is one level and retention reachability is one pass.
    */
  private def readRefs(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(genPath, RefsManifest)
    try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      s.linesIterator.filter(_.nonEmpty).map { l =>
        val i = l.lastIndexOf('\t')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap
    } catch { case _: java.io.FileNotFoundException => Map.empty }
  }

  private def writeRefs(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path, refs: Map[String, Long]): Unit = {
    val os = fs.create(
      new org.apache.hadoop.fs.Path(genPath, RefsManifest), true)
    try os.write(refs.toSeq.sortBy(_._1)
      .map { case (rel, o) => s"$rel\t$o" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  /** Retention with reference reachability: prune a generation at or
    * below the horizon ONLY if no retained generation's manifest
    * references it — a delta keeps its physical ancestors alive for as
    * long as it is itself retained (the storage bill of a long delta
    * chain; a periodic FULL publish breaks the chain, exactly like
    * snapshot compaction in a log-structured table format).
    */
  private def pruneRetained(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, next: Long, keep: Int): Unit = {
    val gens = genDirs(fs, root)
    val referenced = gens.filter(_._1 > next - keep)
      .flatMap { case (_, p) => readRefs(fs, p).values }.toSet
    for ((v, p) <- gens if v <= next - keep && !referenced(v))
      fs.delete(p, true)
  }

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readLong(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[Long] =
    try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      Some(s.toLong)
    } catch { // absent, or renamed away between a caller's exists and open
      case _: java.io.FileNotFoundException => None
    }

  /** Resolve pointer `name`: the committed file, else — during the two-
    * metadata-op rename window of a concurrent flip — its tmp, which is
    * written BEFORE the committed file is deleted and already holds the
    * new value. One re-check of the committed file closes the remaining
    * tmp-renamed-away-underneath race; only a root with no pointer at
    * all resolves to None.
    */
  private def readPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, name: String): Option[Long] = {
    val ptr = new org.apache.hadoop.fs.Path(root, name)
    readLong(fs, ptr)
      .orElse(readLong(fs, new org.apache.hadoop.fs.Path(root,
        "." + name + ".tmp")))
      .orElse(readLong(fs, ptr))
  }

  /** The published version the pointer names, if any. */
  def currentVersion(spark: SparkSession, rootDir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, rootDir)
    readPointer(fs, root, CurrentPointer)
  }

  /** The largest version ever published to this root (≥ current after a
    * rollback; = current otherwise). Roots written before the `_HIGH`
    * pointer existed resolve to the current pointer.
    */
  def publishedHighWater(spark: SparkSession,
      rootDir: String): Option[Long] = {
    val (fs, root) = fsOf(spark, rootDir)
    highWater(fs, root)
  }

  private def highWater(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[Long] = {
    val h = readPointer(fs, root, HighPointer)
    val c = readPointer(fs, root, CurrentPointer)
    (h ++ c).maxOption
  }

  /** Writer-side crash recovery, run before any publish/rollback mutates
    * the root. Completes a flip interrupted between its delete and
    * rename (the tmp holds the committed value); if the current pointer
    * is gone with no tmp either — a loss outside the protocol — adopts
    * the highest on-disk generation instead of ever treating a populated
    * root as version-less, because the caller's orphan cleanup would
    * otherwise delete every generation.
    */
  private def recoverPointers(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    for (name <- Seq(CurrentPointer, HighPointer)) {
      val ptr = new org.apache.hadoop.fs.Path(root, name)
      val tmp = new org.apache.hadoop.fs.Path(root, "." + name + ".tmp")
      if (!fs.exists(ptr) && fs.exists(tmp)) fs.rename(tmp, ptr): Unit
    }
    val ptr = new org.apache.hadoop.fs.Path(root, CurrentPointer)
    if (!fs.exists(ptr)) {
      val gens = genDirs(fs, root)
      if (gens.nonEmpty)
        flipPointer(fs, root, CurrentPointer, gens.map(_._1).max)
    }
  }

  private def genDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("v=") =>
        st.getPath.getName.stripPrefix("v=").toLong -> st.getPath
    }

  private def flipPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, name: String, version: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root, "." + name + ".tmp")
    val os = fs.create(tmp, true)
    try os.write(version.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    val ptr = new org.apache.hadoop.fs.Path(root, name)
    if (fs.exists(ptr)) fs.delete(ptr, false) // local FS rename won't clobber
    if (!fs.rename(tmp, ptr)) throw new IllegalStateException(
      s"Lake: $name flip to v=$version failed (rename returned false)")
  }

  /** Publish `df` as the next generation and flip the pointer. Returns
    * the new version number — allocated above the published high-water,
    * so numbers are monotonic across rollbacks and never reused.
    * Interrupted pointer flips are recovered and unpublished orphans
    * (a crashed prior publish) cleaned first; generations more than
    * `keep` behind the new version are pruned after the flip.
    */
  def publishVersion(
      df: DataFrame, rootDir: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int = 3,
      genMarker: Option[Long] = None,
      zOrderCols: Seq[String] = Nil,
      bloomFilterCols: Seq[String] = Nil,
      schemaPolicy: String = "additive",
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail"): Long = {
    require(keep >= 1, "keep must retain at least the current generation")
    if (digest) // before any write
      validateDigestArgs(partitionCols, df.columns.toSeq)
    val spark = df.sparkSession
    guarded(spark, rootDir) {
    val (fs, root) = fsOf(spark, rootDir)
    recoverPointers(fs, root)
    checkSchemaPolicy(spark, rootDir, df, schemaPolicy, partitionCols): Unit
    val high = highWater(fs, root)
    // a generation above the high-water is a crashed publish that never
    // committed — its files were never readable (pinned reads are capped
    // at the high-water; the pointer never reached it), so deleting is
    // safe under the single-writer contract. Generations BETWEEN the
    // current pointer and the high-water (rolled-back-over) were
    // published and stay until retention prunes them.
    for ((v, p) <- genDirs(fs, root) if v > high.getOrElse(-1L))
      fs.delete(p, true)
    val next = high.getOrElse(-1L) + 1
    // layout write only — no manifest read-back; a publisher wanting the
    // per-partition accounting calls manifest(s"$root/v=$next") after
    val (toWrite, expectObs, quarantine) =
      expectationGate(df, expect, onViolation)
    // in-write digest rides the write job's metrics (zero extra jobs);
    // zOrder publishes keep the read-back path — withZ's quantile pass
    // is a second action over the observed plan, which would race the
    // observation
    val inw = if (digest && zOrderCols.isEmpty)
      inWriteDigest(toWrite, partitionCols) else None
    writeLayout(inw.map(_._2).getOrElse(toWrite), s"$rootDir/v=$next",
      partitionCols, sortCols,
      maxRecordsPerFile, zOrderCols, bloomFilterCols)
    for (o <- expectObs) enforceExpectations(fs,
      new org.apache.hadoop.fs.Path(root, s"v=$next"), o)
    for (q <- quarantine) {
      val qDir = new org.apache.hadoop.fs.Path(root,
        s"v=$next/$QuarantineDir")
      q.write.mode(SaveMode.Overwrite).parquet(qDir.toString)
      // a clean publish carries NO quarantine (readQuarantine's loud
      // "nothing was dropped" contract) — footer count, no column read
      if (spark.read.parquet(qDir.toString).count() == 0L)
        fs.delete(qDir, true): Unit
    }
    // refuse to ship a zero-data-file FULL generation — from an empty
    // input OR a drop mode that quarantined every row: the pointer
    // would serve an unreadable dir to every reader (deltas are exempt:
    // an empty delta legitimately inherits everything through _REFS)
    if (graft.GenSwap.leaves(fs,
        new org.apache.hadoop.fs.Path(root, s"v=$next")).isEmpty) {
      // the quarantine rows are the AUDIT of why the publish was
      // refused — deleting them with the refused generation would
      // destroy exactly the evidence drop mode exists to keep. Re-home
      // them under the root's _QUARANTINE_REFUSED before the delete:
      // keyed by the caller's genMarker when present (a streaming
      // batch's replay overwrites its own copy — idempotent), else by
      // a free attempt counter (v=next can repeat across refusals —
      // a refused publish never bumps the high-water).
      val qSrc = new org.apache.hadoop.fs.Path(root,
        s"v=$next/$QuarantineDir")
      val refusedAt = if (fs.exists(qSrc)) {
        val home = new org.apache.hadoop.fs.Path(root, RefusedQuarantineDir)
        fs.mkdirs(home)
        val dst = genMarker match {
          case Some(m) =>
            val p = new org.apache.hadoop.fs.Path(home, s"m=$m")
            if (fs.exists(p)) fs.delete(p, true): Unit
            p
          case None =>
            Iterator.from(0).map(k =>
              new org.apache.hadoop.fs.Path(home, s"v=${next}_a$k"))
              .find(!fs.exists(_)).get
        }
        if (!fs.rename(qSrc, dst)) throw new java.io.IOException(
          s"Lake: could not preserve the refused publish's quarantine " +
            s"($qSrc -> $dst)")
        Some(dst)
      } else None
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$next"), true): Unit
      throw new RefusedPublishException(
        "Lake: publish produced no data files (empty input, or every " +
          "row quarantined by drop-mode expectations) — refusing to " +
          "publish an unreadable empty generation; the pointer is " +
          "unchanged" + refusedAt.fold("")(p =>
            s"; the quarantined rows are preserved at $p"))
    }
    // a full generation's resolved schema is exactly its input's
    writeSchemaFile(fs,
      new org.apache.hadoop.fs.Path(root, s"v=$next"), df.schema)
    if (digest) writeDigest(spark, fs, root,
      new org.apache.hadoop.fs.Path(root, s"v=$next"), Map.empty,
      precomputedOwn = inw.map { case (obs, _, fp) =>
        (fp, obsDigestEntries(obs)) })
    // the caller's provenance marker (e.g. [[publishStream]]'s batch id)
    // lands INSIDE the generation before the high-water flip, so a
    // generation counted published always carries it — the replay-dedup
    // protocol reads it through the same pointer ordering it writes
    for (m <- genMarker) {
      val os = fs.create(
        new org.apache.hadoop.fs.Path(root, s"v=$next/$BatchMarker"), true)
      try os.write(m.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
    }
    // size ledger inside the generation before it counts as published
    writeSizeFile(spark, fs, new org.apache.hadoop.fs.Path(root, s"v=$next"))
    // high-water first: from here v=next is complete-and-published even
    // if the _CURRENT flip below never runs (it just never became
    // current — the next publish allocates above it)
    flipPointer(fs, root, HighPointer, next)
    flipPointer(fs, root, CurrentPointer, next)
    pruneRetained(fs, root, next, keep)
    next
    }
  }

  /** Publish the next generation as a DELTA: `df`'s partitions are
    * physically rewritten in `v=<next>`, every other partition of the
    * CURRENT generation is inherited by reference — no copy, no scan of
    * the unchanged corpus. Semantics = dynamic partition overwrite,
    * versioned: the new version reads as the current version with
    * `df`'s partitions replaced (or added). Publish cost drops from
    * O(corpus) to O(changed partitions) — the difference between a
    * daily publish being viable and not at 100 TB — while keeping the
    * full contract: immutable generations, pinned time travel, O(1)
    * rollback, loud pruned reads.
    *
    * References are flattened (each names the dir's physical owner), so
    * a read resolves in one level and retention keeps exactly the
    * ancestors still reachable from retained generations
    * ([[pruneRetained]]). An absent partition means "inherit", so plain
    * deltas cannot REMOVE a partition; `replaced` lists base partition
    * dirs (relative paths) whose old content must NOT be inherited even
    * if this delta wrote nothing there — the replacement semantics
    * [[mergeDelta]] needs for delete-to-empty partitions. Crash windows
    * are publishVersion's: the manifest lands inside the generation
    * before the high-water flip, so an interrupted delta is an
    * unpublished orphan.
    */
  def publishDelta(
      df: DataFrame, rootDir: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int = 3,
      genMarker: Option[Long] = None,
      replaced: Set[String] = Set.empty,
      schemaPolicy: String = "additive",
      baseMapHint: Option[(Long, Map[String, Long])] = None,
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail"): Long = {
    require(keep >= 1, "keep must retain at least the current generation")
    require(partitionCols.nonEmpty,
      "publishDelta's replacement unit is the partition dir — " +
        "partitionCols must be non-empty")
    if (digest) // before any write
      validateDigestArgs(partitionCols, df.columns.toSeq)
    val spark = df.sparkSession
    guarded(spark, rootDir) {
    val (fs, root) = fsOf(spark, rootDir)
    recoverPointers(fs, root)
    val oldSchema =
      checkSchemaPolicy(spark, rootDir, df, schemaPolicy, partitionCols)
    val high = highWater(fs, root)
    val cur = readPointer(fs, root, CurrentPointer).getOrElse(
      throw new IllegalStateException(
        s"Lake: publishDelta needs a published base in $rootDir — " +
          "publish a full version first"))
    for ((v, p) <- genDirs(fs, root) if v > high.getOrElse(-1L))
      fs.delete(p, true)
    val next = high.getOrElse(-1L) + 1
    val nextPath = new org.apache.hadoop.fs.Path(root, s"v=$next")
    // expectations see the delta's own rows; note drop mode publishes
    // the clean subset — a partition whose EVERY delta row was
    // quarantined is not rewritten and keeps inheriting its old content
    val (toWrite, expectObs, quarantine) =
      expectationGate(df, expect, onViolation)
    // in-write digest rides the write job (see publishVersion)
    val inw = if (digest) inWriteDigest(toWrite, partitionCols) else None
    writeLayout(inw.map(_._2).getOrElse(toWrite), s"$rootDir/v=$next",
      partitionCols, sortCols, maxRecordsPerFile)
    for (o <- expectObs) enforceExpectations(fs, nextPath, o)
    for (q <- quarantine) {
      val qDir = new org.apache.hadoop.fs.Path(nextPath, QuarantineDir)
      q.write.mode(SaveMode.Overwrite).parquet(qDir.toString)
      if (spark.read.parquet(qDir.toString).count() == 0L)
        fs.delete(qDir, true): Unit
    }
    val changed = graft.GenSwap.leaves(fs, nextPath)
      .collect { case (rel, true) => rel }.toSet
    // the base's resolved partition map: its own physical leaves plus
    // what it already inherited — minus what this delta rewrites
    val curPath = new org.apache.hadoop.fs.Path(root, s"v=$cur")
    // the caller (mergeDelta) may have just walked the same generation
    // to plan its replacements — reuse that listing instead of a second
    // recursive walk, but only if it names THIS base version (defensive
    // under the single-writer contract, free to check)
    val baseMap = baseMapHint match {
      case Some((v, m)) if v == cur => m
      case _ => graft.GenSwap.leaves(fs, curPath)
        .collect { case (rel, true) => rel -> cur }.toMap ++
        readRefs(fs, curPath)
    }
    val inherited = baseMap -- changed -- replaced
    writeRefs(fs, nextPath, inherited)
    if (digest) writeDigest(spark, fs, root, nextPath, inherited,
      precomputedOwn = inw.map { case (obs, _, fp) =>
        (fp, obsDigestEntries(obs)) })
    // the delta's RESOLVED schema = its own columns plus what it still
    // inherits (the policy check proved compatibility); recordable only
    // when the old schema was consulted — under policy "any" the
    // resolution is the reader's business and later checks fall back to
    // readVersion
    for (old <- oldSchema) {
      val ownNames = df.schema.fieldNames.toSet
      writeSchemaFile(fs, nextPath,
        org.apache.spark.sql.types.StructType(
          df.schema.fields ++ old.fields.filterNot(f =>
            ownNames.contains(f.name))))
    }
    // provenance marker before the high-water flip — see publishVersion
    for (m <- genMarker) {
      val os = fs.create(
        new org.apache.hadoop.fs.Path(nextPath, BatchMarker), true)
      try os.write(m.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
    }
    writeSizeFile(spark, fs, nextPath) // size ledger — see publishVersion
    flipPointer(fs, root, HighPointer, next)
    flipPointer(fs, root, CurrentPointer, next)
    pruneRetained(fs, root, next, keep)
    next
    }
  }

  /** MERGE a keyed changelog into the versioned lake — the CDC-to-lake
    * bridge: `changes` carries one row per affected key (`op` =
    * `upsert` | `delete`, plus the row's payload and its partition
    * value), and the result publishes as a DELTA generation in which
    * every key named by the changelog is replaced/removed and every
    * untouched partition is inherited by reference. Cost is
    * O(touched partitions + changelog), never O(corpus): the base read
    * is partition-pruned to the changelog's partitions, the anti-join
    * shuffles only their rows, and the write lands only them — at
    * 100 TB this is the difference between applying a binlog hour in
    * minutes and rewriting the lake nightly. The full versioned
    * contract holds: the merge is one immutable generation behind the
    * atomic pointer (readers see pre-merge or post-merge, never a torn
    * middle), pinned time travel reproduces any pre-merge state, and a
    * bad merge un-ships with an O(1) [[rollbackTo]].
    *
    * Netting: with `seqCol` set, only the LATEST change per key (max
    * seq) survives — the CDC compaction rule ([[graft.Merge]]'s
    * semantics at the lake surface); without it the caller asserts the
    * changelog is already netted (at most one row per key). A key
    * absent from the changelog is untouched; `upsert` inserts or fully
    * replaces the row; `delete` removes it (a delete for an absent key
    * is a no-op, matching the CDC state machine). A partition whose
    * every row is deleted is REMOVED from the new generation (the
    * `replaced` discipline of [[publishDelta]]), not inherited back.
    * Additive schema drift rides the delta reader: upserts may carry
    * new columns; inherited/surviving rows read them as NULL.
    *
    * Partition-stability contract: a change row's partition value names
    * the partition the key LIVES in. With the default
    * `probeMovers=false`, a key whose partition value changed would
    * leave its old copy behind — the caller guarantees partition values
    * are immutable per key (the overwhelmingly common layout: partition
    * by a key-derived or write-once column). `probeMovers=true` lifts
    * the contract at a declared cost: one column-pruned scan of the
    * base's (key, partition) projection finds every partition currently
    * holding a changed key and widens the touched set — O(corpus) in
    * rows but only the key+partition columns in bytes.
    */
  def mergeDelta(
      changes: DataFrame, rootDir: String,
      pkCols: Seq[String], partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int = 3,
      opCol: String = "op", seqCol: Option[String] = None,
      probeMovers: Boolean = false,
      genMarker: Option[Long] = None,
      fillMissing: Boolean = false,
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail"): Long = {
    require(pkCols.nonEmpty, "mergeDelta needs the changelog's key columns")
    require(partitionCols.nonEmpty,
      "mergeDelta's replacement unit is the partition dir — " +
        "partitionCols must be non-empty")
    if (digest) // before any write (survivors carry the base's columns)
      validateDigestArgs(partitionCols, changes.columns.toSeq)
    val spark = changes.sparkSession
    guarded(spark, rootDir) {
    val (fs, root) = fsOf(spark, rootDir)
    recoverPointers(fs, root)
    val cur = readPointer(fs, root, CurrentPointer).getOrElse(
      throw new IllegalStateException(
        s"Lake: mergeDelta needs a published base in $rootDir — " +
          "publish a full version first"))
    // net the changelog to one action per key, then materialize: the net
    // set feeds three consumers (touched-partition collect, anti-join,
    // upsert rows) and must not recompute per consumer
    val keyed = pkCols.map(col)
    // ANY changelog row with an op outside the vocabulary must fail the
    // job loudly, not silently upsert — and the check runs BEFORE
    // netting, so a malformed superseded row (evidence of a broken CDC
    // producer) cannot be silently discarded by the latest-wins fold.
    // raise_error stays codegen'd
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"Lake.mergeDelta: $opCol must be upsert|delete, got: "),
          coalesce(col(opCol), lit("NULL"))))))
    val netted = seqCol match {
      case Some(sc) =>
        // latest-per-key via rank-limit window — the WindowToTopK rule
        // rewrites this to a per-key heap when registered, so netting a
        // large changelog never buffers whole key groups
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyed: _*).orderBy(col(sc).desc)
        checked.withColumn("_graft_rn",
            org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("_graft_rn") === 1).drop("_graft_rn", sc)
      case None => checked
    }
    // materialize the netted set: it feeds three consumers (touched-
    // partition collect, anti-join, upsert rows) and must not recompute
    // per consumer
    val net = graft.Materialize(netted)
    // the touched partition set: bounded by the changelog's distinct
    // partition values (partitions are coarse — lang, date — so this
    // driver-side list is small at any corpus scale)
    def tuples(df: DataFrame): Seq[Seq[Option[String]]] =
      df.select(partitionCols.map(c => col(c).cast("string")): _*)
        .distinct().collect().toSeq
        .map(r => partitionCols.indices.map(i =>
          Option(r.getString(i))).toSeq)
    val baseAll = readVersion(spark, rootDir, Some(cur))
    val touched: Seq[Seq[Option[String]]] =
      if (!probeMovers) tuples(net)
      else {
        // key+partition projection of the whole base — column-pruned, so
        // the probe reads two thin columns, not the corpus — semi-joined
        // with the changed keys: every partition still holding one
        val holders = baseAll
          .select((pkCols ++ partitionCols).map(col): _*)
          .join(net.select(keyed: _*).distinct(), pkCols, "left_semi")
        (tuples(net) ++ tuples(holders)).distinct
      }
    // partition predicate from literals — the literal is cast to the
    // column's NATIVE type (never the column to string), so the filter
    // stays the pure `attr = literal` shape static partition pruning
    // needs, for string and non-string partition columns alike. The
    // single-column case (the common layout) uses isin: it plans as
    // In/InSet — still statically prunable, and O(1)-lookup at high
    // touched counts instead of an OR tree that grows the predicate
    // per partition; multi-column layouts keep the OR of conjunctions
    // (partitions are coarse — the tuple count stays small)
    val baseSchema = baseAll.schema
    def parseNative(s: String,
        dt: org.apache.spark.sql.types.DataType): Option[Any] = {
      import org.apache.spark.sql.types._
      try dt match {
        case StringType => Some(s)
        case LongType => Some(s.toLong)
        case IntegerType => Some(s.toInt)
        case ShortType => Some(s.toShort)
        case ByteType => Some(s.toByte)
        case DoubleType => Some(s.toDouble)
        case FloatType => Some(s.toFloat)
        case BooleanType => Some(s.toBoolean)
        case DateType => Some(java.sql.Date.valueOf(s))
        case TimestampType => Some(java.sql.Timestamp.valueOf(s))
        case _: DecimalType => Some(new java.math.BigDecimal(s))
        case _ => None
      } catch { case _: IllegalArgumentException => None }
    }
    lazy val orPred = touched.map { vals =>
      partitionCols.zip(vals).map { case (c, v) =>
        v.map(s => col(c) === lit(s).cast(baseSchema(c).dataType))
          .getOrElse(col(c).isNull)
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    val pred = partitionCols match {
      case Seq(c) if touched.nonEmpty =>
        val (nulls, vals) = touched.map(_.head).partition(_.isEmpty)
        val native = vals.flatten.map(parseNative(_, baseSchema(c).dataType))
        if (native.exists(_.isEmpty)) orPred // unparseable type: OR form
        else {
          val inSet =
            if (native.isEmpty) lit(false)
            else col(c).isin(native.flatten: _*)
          if (nulls.nonEmpty) inSet || col(c).isNull else inSet
        }
      case _ => orPred
    }
    // an upsert REPLACES the whole row, so the changelog must carry
    // every base column — a projected changelog (a binlog missing a
    // column the base has) would otherwise silently NULL that column on
    // every merged key, and the schema policy could not catch it
    // (survivors still carry the column). Loud by default; NULL-fill is
    // an explicit opt-in.
    if (!fillMissing) {
      val carried = net.columns.toSet -- Set(opCol)
      val missing = baseSchema.map(_.name).filterNot(carried.contains)
      // deletes don't write payloads — only complain when an upsert
      // would actually null the column (cheap limit-1 probe on the
      // already-materialized net)
      if (missing.nonEmpty && !net.filter(col(opCol) === "upsert").isEmpty)
        throw new IllegalArgumentException(
          s"Lake.mergeDelta: changelog lacks base column(s) " +
            s"${missing.mkString("'", "', '", "'")} — an upsert replaces " +
            "the WHOLE row, so merging would silently null them on every " +
            "changed key; project them into the changelog, or pass " +
            "fillMissing=true to null-fill deliberately")
    }
    // survivors: touched partitions minus every changed key; upserts
    // bring the replacement rows (and any brand-new keys/partitions)
    val survivors = baseAll.filter(pred)
      .join(net.select(keyed: _*), pkCols, "left_anti")
    val upserts = net.filter(col(opCol) === "upsert").drop(opCol)
    val merged = survivors.unionByName(upserts, allowMissingColumns = true)
    // every base partition dir matching a touched tuple is REPLACED by
    // whatever the merge wrote there (possibly nothing — all-deleted
    // partitions vanish instead of being inherited back)
    val curPath = new org.apache.hadoop.fs.Path(root, s"v=$cur")
    val baseMap = graft.GenSwap.leaves(fs, curPath)
      .collect { case (rel, true) => rel -> cur }.toMap ++
      readRefs(fs, curPath)
    val touchedSet = touched.toSet
    val replaced = baseMap.keySet.filter(rel =>
      relPartitionValues(rel, partitionCols).exists(touchedSet.contains))
    publishDelta(merged, rootDir, partitionCols, sortCols,
      maxRecordsPerFile, keep, genMarker, replaced,
      baseMapHint = Some(cur -> baseMap), digest = digest,
      expect = expect, onViolation = onViolation)
    }
  }

  /** Parse a partition dir's relative path (`a=1/b=2`) into the declared
    * columns' values (unescaped; None = the Hive null sentinel). None if
    * the path does not carry every declared column.
    */
  private def relPartitionValues(rel: String,
      partitionCols: Seq[String]): Option[Seq[Option[String]]] = {
    val m = rel.split('/').flatMap { seg =>
      val i = seg.indexOf('=')
      if (i < 0) None
      else Some(seg.substring(0, i) ->
        unescapePartitionValue(seg.substring(i + 1)))
    }.toMap
    if (partitionCols.forall(m.contains)) Some(partitionCols.map(m(_)))
    else None
  }

  /** Enforce the single-writer contract instead of only documenting it:
    * `guarded(spark, root) { body }` holds an exclusive `_LOCK` file for
    * the body and releases it after. Acquisition is atomic per scheme:
    * on `file:` the lock is taken with NIO `Files.createFile` (O_EXCL —
    * Hadoop's RawLocalFileSystem `create(overwrite=false)` is an
    * exists-then-open TOCTOU, not a mutex); on HDFS,
    * `create(overwrite=false)` is atomic at the NameNode. Object stores
    * without atomic create (plain S3) cannot host this lock — use a
    * real lock service there; the guard is still a correct mutex on the
    * HDFS-semantics stores (HDFS, ABFS, GCS preconditions). A second
    * writer fails LOUDLY instead of corrupting a concurrent publish;
    * the accident class this exists for is a human maintenance pass
    * (compact, manual publish) colliding with a live streaming
    * publisher. Since r16 every mutating entry point ([[publishVersion]],
    * [[publishDelta]], [[mergeDelta]], [[rollbackTo]], [[vacuum]], the
    * streaming publishers' batch bodies, and [[compact]] on its target
    * dir) acquires this guard ITSELF — callers no longer need to wrap
    * single ops. Explicit `guarded` blocks remain for holding the lock
    * ACROSS a multi-op sequence, and for the one cross-domain case:
    * compacting a generation dir inside a versioned lake locks that DIR,
    * so excluding the lake-root writers (retention pruning the
    * generation mid-compact) still takes `guarded(<lake root>)` around
    * the compact call.
    *
    * No BLIND TTL auto-takeover: a lock left by a crashed writer with no
    * better evidence must be removed by an operator who confirmed the
    * writer is dead (clock-skew takeovers against a lock that never
    * promised to heartbeat are how split-brain happens). The failure
    * message says exactly that. The guard is reentrant per thread, so a
    * guarded body may call guarded lake ops.
    *
    * Three reclaim rules exist (r16 advice; r17 verdict #1 — the
    * reference's lock self-expires, `rcache.py:36-54` `SET NX EX 60` +
    * 50 s refresh, so a crashed holder never needs an operator there;
    * pre-r18 ours did on any path the first two rules missed). The lock
    * records its owner's identity (pid + process start instant + host +
    * Linux boot id + Spark applicationId + heartbeat period + optional
    * stable owner token), and a contender reclaims ONLY when:
    *  - **same owner token**: both the lock and the contender carry the
    *    session conf `graft.lake.owner` (a streaming publisher sets it
    *    to its checkpoint location — stable across restarts, unique per
    *    query) and they are equal. The prior incarnation of THIS query
    *    is the only writer that can have written it, and a checkpointed
    *    query has one live incarnation — the restart is reclaiming its
    *    own lock.
    *  - **same-machine dead pid**: the lock provably names this machine
    *    and the recorded pid is provably dead (no such process, or the
    *    pid's current start instant differs — pid reuse). "This machine"
    *    is proven by Linux boot-id + pid-namespace equality when both
    *    sides recorded them (scheme-independent — a dead local writer's
    *    HDFS lock reclaims too); a legacy lock with no boot id, and a
    *    lock whose boot id DIFFERS (either a different machine or this
    *    machine rebooted — and crash-plus-reboot is exactly the case
    *    this rule self-heals, every pre-reboot pid being dead), falls
    *    back to hostname equality ONLY on `file:` and only when the
    *    hostname is not a known-generic value like `localhost` (r17
    *    advice — container default hostnames collide, and an NFS-mounted
    *    `file:` root is visible from several hosts; NFS-shared roots
    *    are outside this rule's contract, documented in DEPLOY.md — the
    *    heartbeat lease below is the rule that covers them). A matching
    *    boot id with a DIFFERENT pid namespace never death-reclaims: the
    *    sibling container's pids are invisible here, possibly live.
    *  - **stale heartbeat**: the lock advertises a heartbeat period
    *    (`beatms=N` — the holder promises to refresh the lock file's
    *    mtime every N ms while alive; see [[BeatConf]]) and the mtime is
    *    stale by more than [[StaleBeatFactor]]×N. Works on ANY scheme —
    *    this is the reference-parity lease that makes a crashed one-shot
    *    batch publisher on HDFS/S3-with-preconditions self-heal without
    *    an operator. The 6× factor (vs the reference's 1.2×) absorbs GC
    *    pauses and modest clock skew between the holder's beats and the
    *    contender's staleness read; a holder paused longer than 6× its
    *    own advertised period has broken its promise and may be fenced
    *    out — same contract as any lease lock. Locks that never
    *    advertised a heartbeat (legacy, or `setTimes`-unsupported
    *    stores) are never TTL-reclaimed.
    * ALL rules are overridden by provable LIVENESS (r17 advice): a lock
    * whose recorded writer is visible RUNNING on this machine (boot-id /
    * hostname match + pid alive with matching start instant) is never
    * reclaimed — a hung prior incarnation with our token, or a live
    * holder whose heartbeat thread died, must contend loudly, not be
    * split-brained; Spark does not fence checkpoint dirs across driver
    * processes. A lock written by a LIVE process with our own pid is
    * likewise never reclaimed (that is a concurrent sibling thread).
    * Cross-host residual risk remains where liveness is unprovable: a
    * REMOTE holder paused beyond its advertised lease is
    * indistinguishable from a dead one (inherent to lease locks).
    *
    * Reclaims are SERIALIZED through an atomically-created `_LOCK.claim`
    * file: only the claim holder may delete and re-create `_LOCK`, and it
    * re-reads the lock's identity — AND re-evaluates heartbeat staleness,
    * since a beat refreshes mtime without changing identity bytes —
    * under the claim before deleting; two contenders that both observed
    * the same dead writer cannot interleave delete/create and both enter
    * (the TOCTOU split-brain). Losing the claim race, or losing the
    * create race after the delete, stays a loud failure; a claim
    * orphaned by a crash mid-reclaim needs the same hand removal as a
    * legacy stale lock (narrow window, loud message). Legacy pid-only
    * locks carry no host/owner identity and are never reclaimed.
    *
    * Release deletes the lock only while it still carries OUR identity:
    * if a lease takeover fenced us out mid-body, release logs loudly and
    * leaves the new holder's lock alone instead of unlocking a third
    * writer into their publish.
    */
  def guarded[A](spark: SparkSession, rootDir: String)(body: => A): A = {
    val (fs, root) = fsOf(spark, rootDir)
    // loud at entry on schemes where create(overwrite=false) is not a
    // mutex (plain S3) — the caveat below, enforced instead of documented
    graft.GenSwap.requireAtomicFs(fs, root, "Lake.guarded (_LOCK mutex)")
    fs.mkdirs(root)
    val key = fs.makeQualified(root).toString
    if (heldLocks.get().contains(key)) return body // reentrant
    val lock = new org.apache.hadoop.fs.Path(root, LockFile)
    def contended(e: Exception) = new IllegalStateException(
      s"Lake: $rootDir is locked by another writer ($LockFile " +
        "exists). If that writer crashed, confirm it is dead and " +
        s"delete $LockFile by hand — the guard auto-expires only " +
        "heartbeat leases (locks advertising beatms=N, reclaimed " +
        "once their mtime is stale by >6N ms); everything else " +
        "never self-expires (split-brain risk).", e)
    val self = java.lang.ProcessHandle.current()
    val selfStart = self.info().startInstant()
      .map[Long](_.toEpochMilli).orElse(-1L)
    // JVM-level per-root token first (the streaming publishers register
    // theirs via setLockOwner), then the root-scoped conf, then the
    // global conf — two streams to different roots never cross-label
    val ownerToken =
      try (Option(ownerTokens.get(key)) orElse
          spark.conf.getOption(OwnerConf + "." + key) orElse
          spark.conf.getOption(OwnerConf)).map(_.trim).filter(_.nonEmpty)
      catch { case scala.util.control.NonFatal(_) => None }
    // heartbeat period this holder promises (0 = no promise): conf value,
    // defaulted, and zeroed when the store cannot honor it (setTimes probe)
    val beatMs: Long = {
      val want =
        try spark.conf.getOption(BeatConf).flatMap(_.toLongOption)
          .getOrElse(DefaultBeatMs)
        catch { case scala.util.control.NonFatal(_) => DefaultBeatMs }
      if (want > 0 && setTimesWorks(fs, root)) want else 0L
    }
    val ownerLines = Seq(
      s"pid=${self.pid()}",
      s"start=$selfStart",
      s"host=$localHost",
      s"app=${spark.sparkContext.applicationId}") ++
      bootId.map(b => s"boot=$b") ++
      pidNs.map(n => s"pidns=$n") ++
      (if (beatMs > 0) Seq(s"beatms=$beatMs") else Nil) ++
      ownerToken.map(t => s"owner=$t")
    val ownIdentity = ownerLines.map { l =>
      val Array(k, v) = l.split("=", 2); k -> v
    }.toMap
    val owner = ownerLines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // atomic exclusive create of `target` carrying our identity. A
    // FAILED CREATE is contention (Some(e)); an IO failure AFTER winning
    // the create is NOT — the half-written lock (no identity recorded,
    // reclaimable by no one) is removed best-effort and the real error
    // propagates, instead of being misdiagnosed as "locked by another
    // writer" with an unremovable orphan left behind.
    def atomicCreate(target: org.apache.hadoop.fs.Path): Option[Exception] = {
      val uri = fs.makeQualified(target).toUri
      if (uri.getScheme == "file") {
        // local FS: NIO createFile is O_EXCL-atomic; Hadoop's
        // RawLocalFileSystem create(overwrite=false) is exists-then-open
        val p = java.nio.file.Paths.get(uri.getPath)
        val clash =
          try { java.nio.file.Files.createFile(p): Unit; None }
          catch { case e: java.nio.file.FileAlreadyExistsException => Some(e) }
        if (clash.isEmpty)
          try java.nio.file.Files.write(p, owner): Unit
          catch {
            case t: Throwable =>
              try java.nio.file.Files.deleteIfExists(p): Unit
              catch { case scala.util.control.NonFatal(_) => () }
              throw t
          }
        clash
      } else {
        val created =
          try Right(fs.create(target, /* overwrite = */ false))
          catch { case e: java.io.IOException => Left(e) }
        created match {
          case Left(e) => Some(e)
          case Right(os) =>
            try { try os.write(owner) finally os.close() }
            catch {
              case t: Throwable =>
                try fs.delete(target, false): Unit
                catch { case scala.util.control.NonFatal(_) => () }
                throw t
            }
            None
        }
      }
    }
    val qualified = fs.makeQualified(lock).toUri
    // evaluate the reclaim rules against an identity snapshot `h`; called
    // once to decide to claim, and AGAIN under the claim (heartbeats
    // refresh mtime without changing identity bytes, so identity equality
    // alone cannot detect a beat that landed between read and claim)
    def reclaimableNow(h: Map[String, String]): Boolean = {
      val samePidAlive = h.get("pid").contains(self.pid().toString) &&
        h.get("start").forall(_ == selfStart.toString)
      // pid-table visibility is what the pid-evidence rules actually
      // need, and it is proven by boot-id AND pid-namespace equality
      // together: boot_id is per-KERNEL (every container on a host
      // shares it) while pid numbers live in namespaces — boot match
      // alone would let a sibling container judge a live holder's pid
      // "provably dead" because it cannot see it (r18 review #1). A
      // legacy lock with neither field falls back to hostname equality:
      // restricted to file: + non-generic hostnames for the DEATH rule;
      // full-strength (any scheme, generic names included — a FALSE
      // 'live' only refuses a reclaim, the safe direction) for the
      // LIVENESS override (r18 review #4).
      val bootMatch: Option[Boolean] =
        for (a <- h.get("boot"); b <- bootId) yield a == b
      val nsMatch: Option[Boolean] =
        for (n <- h.get("pidns"); on <- pidNs) yield n == on
      // Machine-identity evidence, graded separately for the LIVENESS
      // override and the DEATH rule because a boot MISMATCH means two
      // different things for them (r18 review-3 #3):
      //  - LIVE: the recorded writer cannot be running here under a
      //    different boot id — any local pid hit is reuse — so a boot
      //    mismatch is decisively NOT-live. A boot match still needs the
      //    pid namespaces to agree before a ProcessHandle lookup means
      //    anything (sibling containers share the boot id but not the
      //    pid table); unknowable falls back to hostname equality, broad
      //    (any scheme, generic names included) because a FALSE 'live'
      //    only refuses a reclaim — the safe direction (r18 review #4).
      val legacyHostHere = h.get("host").contains(localHost)
      val sameMachineLive = bootMatch match {
        case Some(false) => false
        case Some(true) => nsMatch.getOrElse(legacyHostHere)
        case None if nsMatch.contains(false) => false
        case None => legacyHostHere
      }
      //  - DEAD: a boot mismatch is EITHER a different machine OR this
      //    machine rebooted — and a crash-plus-reboot is exactly the case
      //    the same-host dead-pid rule existed to self-heal pre-r18, so
      //    it must fall back to the legacy hostname rule (file: scheme +
      //    non-generic hostname; every pid of the old boot is dead
      //    here), not be blocked outright. The cloned-VM residual (same
      //    non-generic hostname, file: root shared across machines = NFS)
      //    is the pre-r18 documented out-of-contract case. A DIFFERENT
      //    pid namespace under a MATCHING boot stays decisive-false: the
      //    sibling container's pids are invisible, possibly live.
      val legacyHostDead = qualified.getScheme == "file" &&
        legacyHostHere && !GenericHosts(localHost.toLowerCase)
      val sameMachineDead = bootMatch match {
        case Some(false) => legacyHostDead
        case Some(true) => nsMatch.getOrElse(legacyHostDead)
        case None if nsMatch.contains(false) => false
        case None => legacyHostDead
      }
      // pid evidence: provably dead = no such pid here, or pid reused
      // (start instants both known and different); presumed live = pid
      // exists and is not provably reused — unknowable starts count as
      // live (conservative in both directions)
      val recStart = h.get("start").flatMap(_.toLongOption).getOrElse(-1L)
      def pidReused(ph: java.lang.ProcessHandle): Boolean = {
        val cur = ph.info().startInstant()
          .map[Long](_.toEpochMilli).orElse(-2L)
        recStart >= 0 && cur >= 0 && recStart != cur
      }
      val pidHere = h.get("pid").flatMap(_.toLongOption)
        .map(p => java.lang.ProcessHandle.of(p))
      val pidProvablyDead =
        pidHere.exists(o => o.map[Boolean](pidReused).orElse(true))
      val pidPresumedLive =
        pidHere.exists(o => o.map[Boolean](ph => !pidReused(ph)).orElse(false))
      // LIVENESS override (r17 advice): a writer visible running on this
      // machine is never reclaimed, whatever rule would otherwise fire
      val provablyLiveHere = sameMachineLive && pidPresumedLive
      val sameToken = ownerToken.isDefined && h.get("owner") == ownerToken
      val deadPidHere = sameMachineDead && pidProvablyDead
      // lease rule: the holder PROMISED to refresh mtime every beatms;
      // stale by > StaleBeatFactor× its own promise ⇒ dead on any scheme
      val staleBeat = h.get("beatms").flatMap(_.toLongOption)
        .filter(_ > 0).exists { bm =>
          val mt = try Some(fs.getFileStatus(lock).getModificationTime)
          catch { case scala.util.control.NonFatal(_) => None }
          mt.exists(m => System.currentTimeMillis() - m > bm * StaleBeatFactor)
        }
      !samePidAlive && !provablyLiveHere &&
        (sameToken || deadPidHere || staleBeat)
    }
    atomicCreate(lock) match {
      case None => ()
      case Some(e) =>
        val holder = readLockIdentity(fs, lock)
        if (!holder.exists(reclaimableNow)) throw contended(e)
        // serialize the reclaim through an atomically-created claim file:
        // only the claim holder may delete/re-create _LOCK, and it
        // re-reads the lock under the claim — two contenders that both
        // observed the dead writer cannot interleave delete/create and
        // both enter (the TOCTOU split-brain a bare delete+retry allows)
        val claim = new org.apache.hadoop.fs.Path(root, LockFile + ".claim")
        atomicCreate(claim).foreach(ce => throw new IllegalStateException(
          s"Lake: $rootDir has a stale $LockFile AND an in-flight (or " +
            s"crash-orphaned) reclaim ($LockFile.claim exists). If no " +
            s"reclaimer is live, confirm and delete $LockFile.claim by " +
            "hand.", ce))
        try {
          readLockIdentity(fs, lock) match {
            case Some(h) if holder.contains(h) && reclaimableNow(h) =>
              // still exactly the identity we proved dead/restarted, and
              // still reclaimable NOW (a heartbeat landing between the
              // first read and the claim refreshes mtime only — the
              // re-evaluation, not identity equality, catches it)
              System.err.println(
                s"[lake] reclaiming $LockFile at $rootDir from a provably " +
                  s"restarted/dead writer (${h.toSeq.sorted
                    .map { case (k, v) => s"$k=$v" }.mkString(", ")})")
              fs.delete(lock, false): Unit
              atomicCreate(lock).foreach(e2 => throw contended(e2))
            case Some(_) =>
              // replaced by a DIFFERENT writer since our read (it is
              // live — it just acquired), or a heartbeat arrived: back
              // off loudly
              throw contended(e)
            case None =>
              // released/reclaimed-away in the window: take it normally
              atomicCreate(lock).foreach(e2 => throw contended(e2))
          }
        } finally {
          // BEST-EFFORT: a claim-delete IOException after the lock was
          // successfully re-created must not propagate — it would mask
          // the acquisition and leak a _LOCK stamped with this LIVE
          // process's identity that no rule can ever reclaim. The
          // orphaned claim only blocks future RECLAIMS (loudly, with
          // its own remediation text), never normal acquisition.
          try fs.delete(claim, false): Unit
          catch {
            case scala.util.control.NonFatal(t) => System.err.println(
              s"[lake] WARNING: could not remove $LockFile.claim at " +
                s"$rootDir ($t) — future reclaims on this root will " +
                "fail loudly until it is removed by hand")
          }
        }
    }
    heldLocks.get().add(key)
    // lease heartbeat: refresh the lock file's mtime every beatMs while
    // the body runs (the reference's 50 s refresh on a 60 s TTL,
    // rcache.py:49-54, as a filesystem mtime). `stopped` suppresses the
    // failure warning for a beat racing the release itself.
    val beatStopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beat: Option[java.util.concurrent.ScheduledFuture[_]] =
      if (beatMs <= 0) None
      else Some(beatExec.scheduleWithFixedDelay(() => {
        if (!beatStopped.get())
          try {
            // beat ONLY a lock still carrying OUR identity: a zombie
            // holder that was lease-fenced while paused must not refresh
            // the usurper's (or any successor's) lock at this path —
            // that would keep its mtime fresh for as long as the zombie
            // body runs and defeat the lease self-heal for every holder
            // after it (r18 review-3 #2). An UNREADABLE lock skips the
            // beat rather than blind-refreshing an unverified file:
            // missed beats are safe up to StaleBeatFactor× the period,
            // and a lock no one can read cannot be reclaimed out from
            // under us either (every reclaim rule needs the identity).
            // The read-then-setTimes window can refresh a usurper's
            // lock at most ONCE (its brand-new mtime makes the refresh
            // a no-op in effect); the hazard was the PERSISTENT refresh.
            readLockIdentity(fs, lock) match {
              case Some(h) if h == ownIdentity =>
                fs.setTimes(lock, System.currentTimeMillis(), -1)
              case Some(_) =>
                beatStopped.set(true)
                System.err.println(
                  s"[lake] WARNING: _LOCK at $rootDir no longer carries " +
                    "this writer's identity — a contender reclaimed the " +
                    "lease (this writer was paused past its heartbeat " +
                    "promise). Stopping beats; release will leave the " +
                    "new holder's lock in place.")
              case None =>
                if (!beatStopped.get()) System.err.println(
                  s"[lake] WARNING: _LOCK heartbeat skipped at $rootDir " +
                    "(lock unreadable) — if this persists past " +
                    s"${beatMs * StaleBeatFactor} ms the lease may be " +
                    "reclaimed by a contender")
            }
          }
          catch {
            case scala.util.control.NonFatal(t) =>
              if (!beatStopped.get()) System.err.println(
                s"[lake] WARNING: _LOCK heartbeat failed at $rootDir " +
                  s"($t) — if this persists past ${beatMs * StaleBeatFactor}" +
                  " ms the lease may be reclaimed by a contender")
          }
      }, beatMs, beatMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    try body
    finally {
      heldLocks.get().remove(key)
      beatStopped.set(true)
      beat.foreach(_.cancel(false): Unit)
      // release only a lock still carrying OUR identity: if a lease
      // takeover fenced us out mid-body (a pause past our own advertised
      // beat promise), deleting would unlock a THIRD writer into the new
      // holder's publish — leave it and shout instead. A TRANSIENT read
      // error must NOT be read as "usurped": skipping the delete then
      // orphans our own live-identity lock, unreclaimable on stores with
      // no lease (r18 review #3). Nor may one transient blip be read as
      // "unreadable garbage" and trigger the delete while a usurper IS
      // live (r18 review-2 #2) — the read is retried for several
      // seconds (a store failover outlasts a 300 ms window, r18
      // review-3 #1), and what a PERSISTENTLY unreadable lock means
      // depends on the lease: with a heartbeat promise (beatMs > 0) the
      // safe move is to LEAVE it — if it is our own orphan it
      // self-expires by the stale-beat rule once we stop beating, and
      // if it is a live usurper's lock it keeps beating and stays
      // protected, so deleting is all downside. Only a no-lease lock
      // (beatMs == 0: opted out, or a setTimes-refusing store) keeps
      // the pre-lease delete — there an orphan would be permanent, and
      // a live usurper cannot exist while we are alive on such a store
      // (no rule reclaims a provably live holder, and no lease rule
      // exists to misfire).
      def identityAtRelease(attempt: Int): Either[Boolean, Map[String, String]] =
        try {
          if (!fs.exists(lock)) Left(true) // already gone
          else readLockIdentity(fs, lock) match {
            case Some(h) => Right(h)
            case None if attempt < 8 =>
              Thread.sleep(500L); identityAtRelease(attempt + 1)
            case None => Left(false) // persistently unreadable
          }
        } catch {
          case scala.util.control.NonFatal(_) if attempt < 8 =>
            Thread.sleep(500L); identityAtRelease(attempt + 1)
          case scala.util.control.NonFatal(_) => Left(false)
        }
      val atRelease = identityAtRelease(0)
      atRelease match {
        case Right(h) if h == ownIdentity => fs.delete(lock, false): Unit
        case Left(true) => () // released/reclaimed away already
        case Left(false) if beatMs > 0 =>
          System.err.println(
            s"[lake] WARNING: $LockFile at $rootDir was persistently " +
              "unreadable at release — leaving it in place: if it is " +
              "this writer's own lock its heartbeat lease expires in " +
              s"<=${beatMs * StaleBeatFactor} ms; if a contender's, " +
              "deleting it would split-brain their publish")
        case Left(false) =>
          System.err.println(
            s"[lake] WARNING: $LockFile at $rootDir was unreadable at " +
              "release — deleting it as our own (identity could not be " +
              "checked; this lock carries no lease, so leaving it would " +
              "orphan a live-identity lock forever)")
          fs.delete(lock, false): Unit
        case Right(_) => System.err.println(
          s"[lake] WARNING: $LockFile at $rootDir no longer carries this " +
            "writer's identity at release — a contender reclaimed the " +
            "lease mid-body (this writer was paused past its heartbeat " +
            "promise). Leaving the new holder's lock in place; THIS " +
            "writer's work in the overlap window is suspect.")
      }
    }
  }

  /** Session conf: lock heartbeat period in ms (default
    * [[DefaultBeatMs]]); `<= 0` disables the lease (the lock then never
    * self-expires — pre-r18 behavior). The period is recorded in the
    * lock (`beatms=N`) so contenders grade staleness against the
    * holder's OWN promise, never a guessed global TTL. */
  val BeatConf = "graft.lake.lock.beat.ms"

  /** Default heartbeat period: 15 s → a 90 s lease at
    * [[StaleBeatFactor]] 6×. The reference runs 50 s beats on a 60 s TTL
    * (1.2×); 6× trades slower crash recovery for immunity to GC pauses
    * and modest clock skew, the split-brain sources a blind TTL has. */
  val DefaultBeatMs = 15000L

  /** A lock whose mtime is stale by more than this multiple of its own
    * advertised `beatms` is lease-expired (see [[BeatConf]]). */
  val StaleBeatFactor = 6L

  /** Four threads, not one: heartbeats of ALL held locks share this
    * pool, and `fs.setTimes` against a hung store (NameNode stall,
    * throttled object store) blocks its thread for the RPC timeout — a
    * single-thread pool would let one sick store starve every healthy
    * lock's beats past their lease (r18 review #2). scheduleWithFixedDelay
    * never runs one lock's task concurrently with itself, so four
    * threads ride out four simultaneously-hung stores; beyond that the
    * loud per-beat failure warning is the operator signal. */
  private lazy val beatExec = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(4,
      (r: Runnable) => {
        val t = new Thread(r, "lake-lock-heartbeat"); t.setDaemon(true); t
      })
    ex.setRemoveOnCancelPolicy(true)
    ex
  }

  /** Hostnames that prove nothing about machine identity (r17 advice:
    * container default hostnames collide across machines). */
  private val GenericHosts =
    Set("localhost", "localhost.localdomain", "unknown-host", "")

  /** Linux boot id — unique per machine per boot, the machine-identity
    * proof hostnames cannot give (r17 advice: NFS-mounted `file:` roots
    * and cloned container hostnames). None off-Linux. */
  private lazy val bootId: Option[String] =
    try {
      val p = java.nio.file.Paths.get("/proc/sys/kernel/random/boot_id")
      if (java.nio.file.Files.isReadable(p))
        Some(java.nio.file.Files.readString(p).trim).filter(_.nonEmpty)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Linux pid-namespace identity (`/proc/self/ns/pid` target, e.g.
    * `pid:[4026531836]`) — boot id alone proves same KERNEL, not same
    * pid table: every container on a host shares the boot id while pids
    * are namespaced, so pid-evidence rules require BOTH to match before
    * trusting a ProcessHandle lookup about another writer. None
    * off-Linux (pid rules then rely on the legacy hostname fallback). */
  private lazy val pidNs: Option[String] =
    try Some(java.nio.file.Files.readSymbolicLink(
      java.nio.file.Paths.get("/proc/self/ns/pid")).toString)
      .filter(_.nonEmpty)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Does this store honor `FileSystem.setTimes` (verified, not assumed:
    * some object-store connectors silently no-op it)? Probed once per
    * filesystem URI with a scratch file whose mtime is set to a known
    * past instant and read back. A store that fails the probe gets no
    * `beatms` promise — its locks simply never lease-expire. */
  private def setTimesWorks(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Boolean = {
    val key = fs.getUri.toString
    Option(setTimesOk.get(key)).map(_.booleanValue).getOrElse {
      val probe = new org.apache.hadoop.fs.Path(root,
        s"$LockFile.beatprobe-${java.lang.ProcessHandle.current().pid()}" +
          s"-${System.nanoTime()}")
      val ok =
        try {
          val os = fs.create(probe, true)
          try os.write('b') finally os.close()
          val target = (System.currentTimeMillis() / 1000L) * 1000L - 10000L
          fs.setTimes(probe, target, -1)
          math.abs(fs.getFileStatus(probe).getModificationTime - target) <=
            1000L
        } catch { case scala.util.control.NonFatal(_) => false }
        finally {
          try fs.delete(probe, false): Unit
          catch { case scala.util.control.NonFatal(_) => () }
        }
      setTimesOk.put(key, ok)
      ok
    }
  }
  private val setTimesOk =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Session conf key for the stable writer-identity token recorded in
    * `_LOCK` (set it to the streaming query's checkpoint location).
    * [[guarded]] reads the root-scoped form `graft.lake.owner.<qualified
    * root>` first (see [[setLockOwner]]) and falls back to this global
    * key. */
  val OwnerConf = "graft.lake.owner"

  /** Record the stable writer-identity token for `rootDir`'s `_LOCK`,
    * scoped to the root so two streams publishing to DIFFERENT roots in
    * one session do not cross-label each other's locks (two writers to
    * the SAME root violate the single-writer contract anyway).
    * [[publishStream]] and [[mergeStream]] call this with their
    * checkpoint location before starting — a checkpointed restart then
    * reclaims its own crashed incarnation's lock without an operator
    * hand-deleting `_LOCK` (the r16 self-healing regression).
    *
    * Stored in a JVM-level map, NOT session conf: a long-lived driver
    * publishing to many roots (or the bench's fresh temp root per pass)
    * would grow the session conf monotonically, with every entry copied
    * into each cloned streaming session. foreachBatch runs in the same
    * JVM as the caller, so the map is visible to every batch; repeated
    * publishes to one root overwrite their entry. The session-conf
    * forms (root-scoped `graft.lake.owner.<qualified root>`, then the
    * global [[OwnerConf]]) remain as user-controlled fallbacks. */
  def setLockOwner(spark: SparkSession, rootDir: String,
      token: String): Unit = {
    val (fs, root) = fsOf(spark, rootDir)
    ownerTokens.put(fs.makeQualified(root).toString, token): Unit
  }

  private val ownerTokens =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private lazy val localHost: String =
    try java.net.InetAddress.getLocalHost.getHostName
    catch { case scala.util.control.NonFatal(_) => "unknown-host" }

  /** Parse `_LOCK`'s key=value identity lines; a legacy pid-only lock
    * (one bare number) parses as just `pid` — no host/owner, so it is
    * never reclaimable. None on read failure (e.g. the holder released
    * between our create attempt and this read — the retry create below
    * settles the race either way). */
  private def readLockIdentity(fs: org.apache.hadoop.fs.FileSystem,
      lock: org.apache.hadoop.fs.Path): Option[Map[String, String]] =
    try {
      val in = fs.open(lock)
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val kvs = text.linesIterator.map(_.trim).filter(_.nonEmpty).flatMap {
        case l if l.contains('=') =>
          val Array(k, v) = l.split("=", 2); Some(k -> v)
        case l if l.forall(_.isDigit) => Some("pid" -> l) // legacy format
        case _ => None
      }.toMap
      if (kvs.isEmpty) None else Some(kvs)
    } catch { case scala.util.control.NonFatal(_) => None }

  private val LockFile = "_LOCK"
  private val heldLocks = ThreadLocal.withInitial[
    scala.collection.mutable.Set[String]](() =>
    scala.collection.mutable.Set.empty[String])

  /** Schema-evolution policy for [[publishVersion]]/[[publishDelta]]
    * against the CURRENT generation's resolved schema:
    *  - `additive` (default): existing columns must keep name and type;
    *    new columns may appear — the drift class every reader here
    *    already fills with NULL;
    *  - `enforce`: exact column set (still name/type-checked);
    *  - `any`: no check (the caller owns compatibility).
    * Publishing a type change or a dropped column fails NAMING the
    * column, before any data is written. Returns the current resolved
    * schema when one was consulted (the publisher records the next
    * generation's `_SCHEMA` from it). The old schema comes from the
    * current generation's `_SCHEMA` file when present — one small read,
    * not a per-publish footer/partition resolution, which matters on
    * the streaming merge path where this runs per micro-batch —
    * falling back to readVersion resolution for pre-`_SCHEMA`
    * generations.
    */
  private def checkSchemaPolicy(spark: SparkSession, rootDir: String,
      df: DataFrame, policy: String, partitionCols: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] = policy match {
    case "any" => None
    case p @ ("additive" | "enforce") =>
      val (fs, root) = fsOf(spark, rootDir)
      readPointer(fs, root, CurrentPointer).map { cur =>
        val old = readSchemaFile(fs,
            new org.apache.hadoop.fs.Path(root, s"v=$cur"))
          .getOrElse(readVersion(spark, rootDir, Some(cur)).schema)
        val nw = df.schema.map(f => f.name -> f.dataType).toMap
        for (f <- old) nw.get(f.name) match {
          case None => throw new IllegalArgumentException(
            s"Lake: schema policy '$p' — column '${f.name}' exists in " +
              s"the current generation but not in the publish; dropping " +
              "columns needs schemaPolicy=\"any\"")
          // partition columns are presence-checked only: their on-disk
          // representation is the directory STRING, re-inferred on read
          // (a long published as bucket=5 reads back int) — their
          // resolved type is an inference artifact, not a contract
          case Some(t) if t != f.dataType &&
              !partitionCols.contains(f.name) =>
            throw new IllegalArgumentException(
              s"Lake: schema policy '$p' — column '${f.name}' changes " +
                s"type ${f.dataType.simpleString} -> ${t.simpleString}; " +
                "type changes need schemaPolicy=\"any\"")
          case _ => ()
        }
        if (p == "enforce") {
          val oldNames = old.map(_.name).toSet
          for (n <- df.schema.map(_.name) if !oldNames.contains(n))
            throw new IllegalArgumentException(
              s"Lake: schema policy 'enforce' — new column '$n'; " +
                "additions need schemaPolicy=\"additive\"")
        }
        old
      }
    case other => throw new IllegalArgumentException(
      s"Lake: schemaPolicy must be additive|enforce|any, got '$other'")
  }

  private val SchemaFile = "_SCHEMA"
  private val DigestFile = "_DIGEST"
  /** Row-hash algorithm tag folded into every digest fingerprint. Bump on
    * any change to the digest row hash: v2 = r16's 32-col mask words with
    * zero-sign bits + UTC-pinned to_json (v1, untagged, was the pre-r16
    * hash — its digests now visibly mismatch instead of silently
    * full-diffing). */
  private val DigestAlgVersion = "alg=2;"
  private val QuarantineDir = "_QUARANTINE"
  private val RefusedQuarantineDir = "_QUARANTINE_REFUSED"

  /** The quarantines of REFUSED publishes (drop-mode expectations that
    * quarantined every row — [[publishVersion]] re-homes them before
    * deleting the refused generation). One subdir per refusal: `m=<id>`
    * for marker-carrying publishes (streaming batches — replays
    * overwrite their own copy), `v=<n>_a<k>` otherwise. Loud when no
    * publish was ever refused, matching [[readQuarantine]]'s contract.
    */
  def readRefusedQuarantine(spark: SparkSession, rootDir: String): DataFrame = {
    val (fs, root) = fsOf(spark, rootDir)
    val home = new org.apache.hadoop.fs.Path(root, RefusedQuarantineDir)
    if (!fs.exists(home) || fs.listStatus(home).isEmpty)
      throw new IllegalStateException(
        s"Lake: $rootDir has no refused-publish quarantine — no drop-mode " +
          "publish was ever refused with every row quarantined")
    fs.listStatus(home).toSeq.map(_.getPath)
      .sortBy(_.getName)
      .map(p => spark.read.parquet(p.toString)
        .withColumn("_graft_refusal", lit(p.getName)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Publish-time data-quality expectations — the CHECK-constraint /
    * expectation gate a curated corpus needs at its write boundary
    * (malformed rows caught where they try to ship, not three stages
    * downstream): `expect` is a list of named row predicates; a row
    * VIOLATES when its predicate is not true (null counts as a
    * violation — a quality rule that cannot evaluate has not passed).
    *
    *  - `onViolation = "fail"`: violation counts are observed ON the
    *    layout write itself (one `CollectMetrics` node — zero extra
    *    pass, the house Observation discipline); any violation deletes
    *    the just-written generation (still an orphan — the high-water
    *    never moved) and throws naming every violated expectation and
    *    its count. The pointer is untouched: readers keep the previous
    *    version, the failed publish leaves NOTHING behind.
    *  - `onViolation = "drop"`: clean rows publish; violating rows land
    *    in a `_QUARANTINE` parquet INSIDE the generation (hidden from
    *    every data reader, visible to [[readQuarantine]]) carrying a
    *    `_graft_violated` column naming the failed expectations — the
    *    audit trail a quality pipeline re-processes. Drop mode
    *    evaluates the input lineage twice (kept write + quarantine
    *    write); the standard deterministic-lineage assumption applies.
    *
    * On [[publishDelta]]/[[mergeDelta]] the expectations see the
    * generation's OWN rows only — inherited partitions were checked
    * when they originally published.
    */
  private def expectationGate(df: DataFrame, expect: Seq[(String, Column)],
      onViolation: String): (DataFrame,
      Option[org.apache.spark.sql.Observation], Option[DataFrame]) = {
    if (expect.isEmpty) return (df, None, None)
    def pass(c: Column): Column = coalesce(c, lit(false))
    onViolation match {
      case "fail" =>
        val obs = new org.apache.spark.sql.Observation(
          "graft_expect_" + java.util.UUID.randomUUID())
        val exprs = expect.map { case (n, c) =>
          sum(when(pass(c), 0L).otherwise(1L)).as(n)
        }
        (df.observe(obs, exprs.head, exprs.tail: _*), Some(obs), None)
      case "drop" =>
        val allPass = expect.map(e => pass(e._2)).reduce(_ && _)
        val quarantined = df.filter(!allPass)
          .withColumn("_graft_violated", concat_ws(",",
            expect.map { case (n, c) =>
              when(!pass(c), lit(n))
            }: _*))
        (df.filter(allPass), None, Some(quarantined))
      case other => throw new IllegalArgumentException(
        s"Lake: onViolation must be fail|drop, got '$other'")
    }
  }

  /** Enforce a fail-mode expectation result: any violation deletes the
    * orphan generation and throws with every violated expectation named.
    */
  private def enforceExpectations(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path,
      obs: org.apache.spark.sql.Observation): Unit = {
    val counts = obs.get.map { case (k, v) =>
      k -> (v match { case null => 0L; case n: Number => n.longValue() })
    }
    val bad = counts.filter(_._2 > 0)
    if (bad.nonEmpty) {
      fs.delete(genPath, true): Unit
      throw new IllegalArgumentException(
        "Lake: publish rejected by expectation(s) " +
          bad.toSeq.sortBy(_._1)
            .map { case (n, c) => s"$n ($c rows)" }.mkString(", ") +
          " — the generation was discarded, the pointer is unchanged")
    }
  }

  /** The quarantined rows of a drop-mode publish (the generation's own
    * `_QUARANTINE`): original columns plus `_graft_violated` naming the
    * failed expectations. Fails loudly when the generation carries no
    * quarantine (nothing was dropped, or the publish ran without
    * expectations).
    */
  def readQuarantine(spark: SparkSession, rootDir: String,
      version: Option[Long] = None): DataFrame = {
    val (fs, root) = fsOf(spark, rootDir)
    val v = version.orElse(readPointer(fs, root, CurrentPointer)).getOrElse(
      throw new IllegalStateException(
        s"Lake: $rootDir has no published version"))
    val p = new org.apache.hadoop.fs.Path(root, s"v=$v/$QuarantineDir")
    if (!fs.exists(p)) throw new IllegalStateException(
      s"Lake: version $v of $rootDir has no quarantine — nothing was " +
        "dropped, or it was published without expectations")
    spark.read.parquet(p.toString)
  }

  /** Per-partition content fingerprints (opt-in `digest = true` at
    * publish): one entry per partition dir, KEYED BY THE DIR’S RELATIVE
    * PATH (the one form both generations and the feed’s dir plan share
    * exactly — partition VALUES are deliberately never parsed or
    * re-inferred, so no type-inference or escaping form can desync the
    * keys). Each entry is a row count plus an order-independent
    * `bit_xor` of per-row `xxhash64` over the DATA columns (the dir
    * path already pins the partition values; atomic schemas hash
    * columns directly with an explicit null-mask — Spark’s hash
    * functions SKIP null inputs, which would conflate a null in column
    * A with a null in column B and with the empty string — while
    * nested array/map/struct schemas take a canonical-json slow path,
    * because the skip problem recurs INSIDE such values where a mask
    * cannot reach; measured ~3.7× publish read-back at 100× for json
    * vs near-free for the atomic path). Written as a small `_DIGEST`
    * text file inside the generation before the high-water flip — a
    * text file, not a parquet, because Spark’s hidden-path filtering
    * ignores parquet files under an underscore-named dir on some read
    * paths, and a metadata read this small should not cost a Spark job.
    *
    * The change feed uses digests to SKIP partitions whose content is
    * value-identical across a step even when both sides physically
    * rewrote them — the FULL-republish case owner-map pruning cannot
    * see through. Cost model: one read-back aggregate of the
    * generation’s OWN dirs per publish (one scan branch per dir —
    * partition dirs are coarse by the layout’s design, the same
    * O(dirs) bound as manifest/vacuum). Deltas copy donor entries for
    * inherited dirs instead of reading them — O(changed) preserved —
    * dropping entries whose column fingerprint differs (schema drift
    * disables cross-generation skipping, conservatively). Equality is
    * a 64-bit fingerprint: a false "identical" needs an xxhash64 xor
    * collision (~2⁻⁶⁴ per dir pair) — the standard
    * content-addressing trade, stated rather than hidden. Float zeros:
    * Spark's hash normalizes -0.0 == 0.0, so the atomic path folds each
    * float/double column's zero-sign into the mask words (the nested
    * json path renders "-0.0" textually) — a dir differing only in zero
    * sign digests as DIFFERENT, closing the one unsafe-skip hole; NaN
    * stays canonicalized (any NaN == any NaN, deliberately). Timestamps
    * in the json path render with a pinned UTC timeZone so digests
    * agree across sessions. (Digests written before these pins hash
    * differently — cross-upgrade steps fall back to full diffs, the
    * safe direction.)
    */
  /** The digest row hash + column fingerprint over `schema`'s data
    * columns (everything except `exclude` — partition cols on the
    * in-write path, the `_rel` tag on the read-back path): ONE shared
    * construction so the two digest paths are bit-identical by
    * construction. Returns (fp, rowHash).
    */
  private def digestHash(schema: org.apache.spark.sql.types.StructType,
      exclude: Set[String]): (String, Column) = {
    val dataCols = schema.fieldNames.filterNot(exclude).sorted.toSeq
    val fp = DigestAlgVersion + dataCols.map(c =>
      s"$c:${schema(c).dataType.simpleString}").mkString(",")
    val nested = dataCols.exists { c =>
      val t = schema(c).dataType.catalogString
      t.contains("array<") || t.contains("map<") || t.contains("struct<")
    }
    val rowHash =
      if (nested)
        // fixed timeZone: to_json renders timestamps in the SESSION
        // timezone by default, so cross-session digests of the same
        // bytes would differ and silently defeat skipping (safe
        // direction, but it negates the O(truly-changed) claim)
        xxhash64(to_json(struct(dataCols.map(col): _*),
          Map("timeZone" -> "UTC")))
      else {
        // Spark's hash functions normalize -0.0 == 0.0, so a dir
        // differing only in a zero's sign would digest-skip as
        // identical — an UNSAFE false skip. Fold the zero's sign
        // into the null-mask words (the string cast renders "-0.0",
        // the one ANSI-safe test that distinguishes the zeros —
        // 1/-0.0 would throw DIVIDE_BY_ZERO under ANSI); NaN
        // canonicalization is kept — any NaN equals any NaN.
        // (to_json above renders "-0.0" textually, so the nested
        // path already separates them.)
        val isFloat = dataCols.map(c =>
          schema(c).dataType match {
            case org.apache.spark.sql.types.DoubleType |
                 org.apache.spark.sql.types.FloatType => true
            case _ => false
          })
        val masks = dataCols.zip(isFloat).grouped(32).map { g =>
          g.zipWithIndex.map { case ((c, f), j) =>
            val nullBit =
              when(col(c).isNull, lit(1L << (2 * j))).otherwise(lit(0L))
            if (!f) nullBit
            else nullBit + when(col(c) === 0.0 &&
                col(c).cast("string").startsWith("-"),
              lit(1L << (2 * j + 1))).otherwise(lit(0L))
          }.reduce(_ + _)
        }.toSeq
        xxhash64(dataCols.map(col) ++ masks: _*)
      }
    (fp, rowHash)
  }

  /** Test seam: forces the read-back digest path when false — the
    * in-write/read-back parity spec flips it to prove both paths land
    * identical `_DIGEST` entries on the same input.
    */
  private[graft] var inWriteDigestEnabled = true

  /** IN-WRITE digest (guide §6/§2.4 — the write job carries the digest
    * aggregate through an [[org.apache.spark.sql.Observation]], so a
    * digest-enabled publish costs ZERO extra jobs and never re-reads the
    * bytes it just wrote; the prior shape paid one full read-back scan
    * of the generation per publish — O(written bytes) at scale). Only
    * when every partition column's dir-name rendering is exact
    * (DigestMapAgg.supportedPartType); anything else returns None and
    * the caller falls back to the read-back scan. The returned frame
    * REPLACES the written one (same rows, plus the metrics collector);
    * the fp + observation map feed [[writeDigest]]'s `precomputedOwn`.
    */
  private def inWriteDigest(toWrite: DataFrame, partitionCols: Seq[String])
      : Option[(org.apache.spark.sql.Observation, DataFrame, String)] = {
    val schema = toWrite.schema
    if (!inWriteDigestEnabled || !partitionCols.forall(c =>
        org.apache.spark.sql.graft.DigestMapAgg
          .supportedPartType(schema(c).dataType))) None
    else {
      val (fp, rowHash) = digestHash(schema, partitionCols.toSet)
      val obs = new org.apache.spark.sql.Observation(
        "graft_digest_" + java.util.UUID.randomUUID())
      val wrapped = toWrite.observe(obs,
        org.apache.spark.sql.graft.DigestMapAgg
          .column(partitionCols.map(col), partitionCols, rowHash)
          .as("digest"))
      Some((obs, wrapped, fp))
    }
  }

  /** The observed digest map, as writeDigest's own-entry list (sorted
    * for a deterministic `_DIGEST` body). Blocks only until the write
    * action that carried the observation completed — which it has, the
    * caller reads this after writeLayout returned.
    */
  private def obsDigestEntries(obs: org.apache.spark.sql.Observation)
      : Seq[(String, (Long, Long))] =
    obs.get("digest") match {
      case m: scala.collection.Map[_, _] =>
        m.toSeq.map { case (k, v) =>
          val r = v.asInstanceOf[org.apache.spark.sql.Row]
          (k.toString, (r.getLong(0), r.getLong(1)))
        }.sortBy(_._1)
      case _ => Nil
    }

  private def writeDigest(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, root: org.apache.hadoop.fs.Path,
      genPath: org.apache.hadoop.fs.Path,
      refs: Map[String, Long],
      precomputedOwn: Option[(String, Seq[(String, (Long, Long))])] = None)
      : Unit = {
    val ownRels = graft.GenSwap.leaves(fs, genPath)
      .collect { case (rel, true) => rel }
    val ownEntries: Seq[(String, (Long, Long), String)] =
      if (precomputedOwn.isDefined) {
        // in-write path: entries observed ON the write job (zero extra
        // jobs). Mirror the read-back path's empty-own semantics: with
        // no own dirs the effective fp comes from the donors below.
        val (fp, entries) = precomputedOwn.get
        entries.map { case (rel, nx) => (rel, nx, fp) }
      }
      else if (ownRels.isEmpty) Nil
      else {
        // one scan branch per dir, tagged with its rel path — partition
        // columns never enter the read, so the key is exactly the dir.
        // (input_file_name() could tag in one branch, but its URI form
        // vs the raw dir-name form is ambiguous for escaped names —
        // exactly the key-desync class the rel keying exists to kill.)
        // Branch count = dir count, coarse by the layout's design; the
        // union folds as a balanced tree so plan depth is O(log dirs),
        // not O(dirs)
        def unionAll(dfs: Seq[DataFrame]): DataFrame =
          if (dfs.size == 1) dfs.head
          else {
            val (l, r) = dfs.splitAt(dfs.size / 2)
            unionAll(l).unionByName(unionAll(r),
              allowMissingColumns = true)
          }
        val own = unionAll(ownRels.sorted.map { rel =>
          spark.read.parquet(
              new org.apache.hadoop.fs.Path(genPath, rel).toString)
            .withColumn("_rel", lit(rel))
        })
        // fp carries DigestAlgVersion beside the names:types (r16
        // advice) so hash-algorithm changes self-describe; the hash
        // itself is the ONE shared digestHash construction — identical
        // to the in-write path's by construction
        val (fp, rowHash) = digestHash(own.schema, Set("_rel"))
        own.withColumn("_h", rowHash)
          .groupBy(col("_rel"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(_h)").as("x"))
          .collect().toSeq
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)), fp))
      }
    // donors: same frozen files, same digest — copy entries for the
    // inherited dirs instead of re-reading them (keeps deltas
    // O(changed)). One fingerprint per digest table: own rows set it;
    // with no own rows (an all-delete delta) the first donor’s fp
    // becomes the table’s; donors disagreeing with the effective fp
    // are dropped (drift = no cross-generation skipping)
    var effFp = ownEntries.headOption.map(_._3)
    val donorEntries = refs.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (o, m) =>
        readDigest(fs,
          new org.apache.hadoop.fs.Path(root, s"v=$o")) match {
          case Some((fp, entries)) if effFp.forall(_ == fp) =>
            if (effFp.isEmpty) effFp = Some(fp)
            val wanted = m.keySet
            entries.filter { case (rel, _) => wanted(rel) }
              .map { case (rel, nx) => (rel, nx, fp) }
          case _ => Nil
        }
    }
    // sorted: the _DIGEST body is deterministic regardless of which path
    // produced the entries (consumers parse it into a map; the order is
    // purely for reproducible artifacts and the parity spec)
    val all = (ownEntries ++ donorEntries).sortBy(_._1)
    for (fp <- effFp if all.nonEmpty) {
      // line 1 = the column fingerprint; then one `n \t x \t rel` row per
      // dir, rel URL-encoded so any dir path round-trips through the file
      val body = (java.net.URLEncoder.encode(fp, "UTF-8") +: all.map {
        case (rel, (n, x), _) =>
          s"$n\t$x\t${java.net.URLEncoder.encode(rel, "UTF-8")}"
      }).mkString("\n")
      val os = fs.create(
        new org.apache.hadoop.fs.Path(genPath, DigestFile), true)
      try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
    }
  }

  /** Argument errors a digest-enabled publish can detect before writing
    * anything — checked at the publish entry points so a bad call fails
    * instantly instead of after the corpus write.
    */
  private def validateDigestArgs(partitionCols: Seq[String],
      dataCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty,
      "Lake: digest=true needs partitioned generations (the skip unit " +
        "is the partition dir)")
    val clash = (partitionCols ++ dataCols)
      .filter(c => c == "_rel" || c == "_h").distinct
    require(clash.isEmpty,
      s"Lake: digest=true reserves column names _rel/_h; rename the " +
        s"clashing column(s) ${clash.mkString(", ")}")
  }

  /** A generation’s digest table, if it carries one: (column
    * fingerprint, rel dir → (count, xor)).
    */
  private def readDigest(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path)
      : Option[(String, Map[String, (Long, Long)])] =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(genPath, DigestFile))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = s.linesIterator.toSeq
      if (lines.length < 2) None
      else {
        val fp = java.net.URLDecoder.decode(lines(0), "UTF-8")
        val entries = lines.drop(1).filter(_.nonEmpty).map { l =>
          val f = l.split('\t')
          java.net.URLDecoder.decode(f(2), "UTF-8") ->
            (f(0).toLong, f(1).toLong)
        }.toMap
        Some((fp, entries))
      }
    } catch {
      case _: java.io.FileNotFoundException => None
      // an unparseable digest (pre-rel-format writer, corruption) must
      // degrade to "no digest" — the skip is an optimization, never a
      // correctness dependency
      case _: NumberFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Record a generation's RESOLVED schema (json) inside it — written
    * before the high-water flip, so a published generation always
    * carries it; crashed orphans' copies die with them.
    */
  private def writeSchemaFile(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val os = fs.create(
      new org.apache.hadoop.fs.Path(genPath, SchemaFile), true)
    try os.write(schema.json
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  private def readSchemaFile(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path)
      : Option[org.apache.spark.sql.types.StructType] =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(genPath, SchemaFile))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(s)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    } catch { case _: java.io.FileNotFoundException => None }

  private val SizeFile = "_SIZE"

  /** A generation's OWN physical data files (underscore/dot metadata and
    * inherited partitions excluded — the latter live in donor
    * generations), by recursive listing. */
  private def physicalFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    def walk(d: org.apache.hadoop.fs.Path): Unit =
      for (st <- fs.listStatus(d)) {
        val n = st.getPath.getName
        if (st.isDirectory) { if (graft.GenSwap.isDataName(n)) walk(st.getPath) }
        else if (graft.GenSwap.isDataName(n)) out += st
      }
    walk(p)
    out.result()
  }

  /** (n_files, n_bytes) of a generation's own footprint. */
  private def physicalSize(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): (Long, Long) = {
    val files = physicalFiles(fs, p)
    (files.size.toLong, files.map(_.getLen).sum)
  }

  /** Total row count by driver-side parquet FOOTER reads — no Spark job.
    * The ledger stamp runs inside the guarded publish critical section
    * (per micro-batch on the streaming path), where a scheduled count()
    * job's submission latency would lengthen every lock hold (r18
    * review-3 #7); footers carry the exact record count, so this is the
    * same number with pure metadata I/O. None on any unreadable footer —
    * the caller falls back to the count() job. */
  private def footerRowCount(fs: org.apache.hadoop.fs.FileSystem,
      files: Seq[org.apache.hadoop.fs.FileStatus]): Option[Long] =
    try {
      val conf = fs.getConf
      var n = 0L
      for (st <- files) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try n += r.getRecordCount finally r.close()
      }
      Some(n)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Size ledger, written ONCE at publish (and refreshed by [[compact]]):
    * `n_files n_bytes n_rows`. [[vacuum]] and [[history]] read this one
    * small file per generation instead of re-walking every file of every
    * generation driver-side per call — at a year of hourly publishes the
    * accounting was O(generations × files) listings plus one Spark
    * count() job per generation per history() call (r17 verdict #2); the
    * ledger makes both O(generations) tiny reads. Generations without a
    * ledger (pre-upgrade) fall back to the walk. The row count comes
    * from driver-side footer reads ([[footerRowCount]]) — the stamp adds
    * zero Spark jobs to the publish critical section; a footer a parquet
    * reader cannot open falls back to one footer-only count() job. */
  private def writeSizeFile(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path): Unit = {
    val files = physicalFiles(fs, genPath)
    val nf = files.size.toLong
    val nb = files.map(_.getLen).sum
    val nRows =
      if (nf == 0) 0L
      else footerRowCount(fs, files).getOrElse(
        spark.read.parquet(genPath.toString).count())
    writeSizeEntries(fs, genPath, nf, nb, nRows)
  }

  private def writeSizeEntries(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path,
      nf: Long, nb: Long, nRows: Long): Unit = {
    val os = fs.create(new org.apache.hadoop.fs.Path(genPath, SizeFile), true)
    try os.write(s"$nf $nb $nRows\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  private def readSizeFile(fs: org.apache.hadoop.fs.FileSystem,
      genPath: org.apache.hadoop.fs.Path): Option[(Long, Long, Long)] =
    try {
      val in = fs.open(new org.apache.hadoop.fs.Path(genPath, SizeFile))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      s.trim.split("\\s+") match {
        case Array(a, b, c) =>
          for (x <- a.toLongOption; y <- b.toLongOption; z <- c.toLongOption)
            yield (x, y, z)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Read one immutable generation: the pointer's (default) or a pinned
    * `version` (time travel — reproduce exactly what a past training run
    * consumed, within the retention horizon). Fails loudly on a version
    * that was never published or has been pruned.
    */
  def readVersion(spark: SparkSession, rootDir: String,
      version: Option[Long] = None): DataFrame = {
    val (fs, root) = fsOf(spark, rootDir)
    val v = version.orElse(readPointer(fs, root, CurrentPointer)).getOrElse(
      throw new IllegalStateException(
        s"Lake: $rootDir has no published version"))
    // pinned reads are allowed up to the published HIGH-WATER, not just
    // the current pointer: a rolled-back-over generation was published,
    // is within retention, and a consumer may need to reproduce exactly
    // what it read from it. Above the high-water = a crashed publish's
    // incomplete files — never readable.
    if (version.exists(v => highWater(fs, root).forall(_ < v)))
      throw new IllegalStateException(
        s"Lake: version $v of $rootDir was never published " +
          s"(high-water=${highWater(fs, root).orNull})")
    val dir = new org.apache.hadoop.fs.Path(root, s"v=$v")
    if (!fs.exists(dir)) throw new IllegalStateException(
      s"Lake: version $v of $rootDir was never published or has been " +
        s"pruned (current=${currentVersion(spark, rootDir).orNull})")
    val refs = readRefs(fs, dir)
    if (refs.isEmpty) spark.read.parquet(dir.toString)
    else {
      // delta generation: one pruning-intact parquet branch per physical
      // owner (its explicit leaf dirs + basePath recover the partition
      // columns), unioned — ≤ keep branches, additive schema drift
      // across the chain fills with NULL like the state reader
      val own = graft.GenSwap.leaves(fs, dir)
        .collect { case (rel, true) => rel }
      val branches =
        (if (own.nonEmpty) Seq(v -> own) else Nil) ++
          refs.groupBy(_._2).map { case (o, m) => o -> m.keys.toSeq }
      branches.map { case (o, rels) =>
        val base = new org.apache.hadoop.fs.Path(root, s"v=$o")
        // a delta surviving the horizon only as a physical-dir donor can
        // have lost its OWN ancestors — fail with the retention
        // contract's words, not a raw path error from the scan
        if (!fs.exists(base)) throw new IllegalStateException(
          s"Lake: version $v of $rootDir inherits partitions from " +
            s"v=$o, which has been pruned — v=$v is outside the " +
            "retention horizon")
        spark.read.option("basePath", base.toString)
          .parquet(rels.sorted.map(r =>
            new org.apache.hadoop.fs.Path(base, r).toString): _*)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** [[snapshotDiff]] between two published generations of a versioned
    * lake — the audit a training pipeline runs before moving its data
    * dependency from version A to version B: both sides are immutable
    * dirs, so the diff is reproducible for as long as retention holds
    * them.
    */
  def diffVersions(spark: SparkSession, rootDir: String,
      oldVersion: Long, newVersion: Long,
      idCol: String, contentCol: String): DataFrame =
    snapshotDiff(
      readVersion(spark, rootDir, Some(oldVersion)),
      readVersion(spark, rootDir, Some(newVersion)), idCol, contentCol)

  /** Change data feed: every change a version range introduced, one row
    * per (version, key) — `(v, <idCol>, change, old_hash, new_hash)`
    * where `change` ∈ added|removed|changed and row `v` means "version v
    * changed this key vs its predecessor v−1". This is the incremental-
    * consumption surface a downstream pipeline polls instead of
    * re-diffing snapshots: the dedup/decontam/index stages re-process
    * exactly the keys the feed names ([[graft.operators.TextDedup]]'s
    * incremental ingest, [[graft.operators.LshIndex]].remove for the
    * removed keys) and never re-read the settled corpus.
    *
    * Cost is O(physically changed partitions), not O(corpus × steps):
    * each step diffs ONLY the partition dirs whose physical owner
    * differs between the two generations' resolved maps (own leaves +
    * `_REFS`). A dir inherited by reference on both sides is the same
    * frozen files — zero rows of it are read. Delta/merge generations
    * therefore pay their changed partitions; a FULL republish owns every
    * dir, so its step is a full diff (the publish rewrote everything —
    * the feed cannot know rows survived without hashing them). At
    * 100 TB: tailing a merge-maintained lake costs each batch's touched
    * partitions twice (old + new side of the hash), document bodies
    * reduce to md5 map-side before the one id-keyed shuffle
    * ([[snapshotDiff]]'s shape).
    *
    * Every generation in `[fromVersion, toVersion]` must be published
    * and within the retention horizon — a pruned step fails loudly in
    * the retention contract's words (size `keep` to the slowest
    * consumer, same rule as pinned reads). Key uniqueness per version is
    * the caller's contract, as in [[snapshotDiff]]. Unpartitioned
    * generations (no partition dirs) fall back to a full per-step diff.
    *
    * Plan size is BOUNDED (r15 verdict #4): a polling cursor takes one
    * lazy plan of ≤ `maxPlanSteps` union branches, but a consumer
    * catching up after long downtime (or a replayed DR consumer) must
    * not hand the analyzer one plan with O(steps) diff branches — past
    * `maxPlanSteps` the feed drains in windows of that width,
    * materializing each window (forced — the bound must hold in every
    * `spark.graft.materialize` mode) and unioning the materialized
    * results, so analyzer/optimizer cost per window is flat and the
    * final plan is a union of trivial materialized scans. The step
    * semantics are unchanged — windows partition the same per-step
    * diffs. Two costs of the windowed form, by design: construction
    * EXECUTES the diffs eagerly (call with the range you actually want
    * — a post-hoc `.filter(col("v") > …)` no longer prunes steps), and
    * the window blocks stay pinned until [[graft.Materialize.release]].
    * A long-lived or storage-sensitive consumer should drain
    * [[changesBetweenPaged]] instead — lazy bounded plans, nothing
    * pinned, cursor-friendly.
    */
  def changesBetween(spark: SparkSession, rootDir: String,
      fromVersion: Long, toVersion: Long,
      idCol: String, contentCol: String,
      maxPlanSteps: Int = 16): DataFrame = {
    require(maxPlanSteps >= 1, "maxPlanSteps must be at least 1")
    require(fromVersion >= 0 && fromVersion <= toVersion,
      s"changesBetween needs 0 <= from <= to, got $fromVersion..$toVersion")
    val (fs, root) = fsOf(spark, rootDir)
    if (highWater(fs, root).forall(_ < toVersion))
      throw new IllegalStateException(
        s"Lake: version $toVersion of $rootDir was never published " +
          s"(high-water=${highWater(fs, root).orNull})")
    for (v <- fromVersion to toVersion
         if !fs.exists(new org.apache.hadoop.fs.Path(root, s"v=$v")))
      throw new IllegalStateException(
        s"Lake: change feed $fromVersion..$toVersion of $rootDir needs " +
          s"v=$v, which has been pruned — the range is outside the " +
          "retention horizon")
    if (fromVersion == toVersion) {
      // empty feed with the feed's schema (the poller's no-news result)
      val side = readVersion(spark, rootDir, Some(toVersion))
        .select(col(idCol), col(contentCol)).limit(0)
      return snapshotDiff(side, side, idCol, contentCol)
        .withColumn("v", lit(toVersion))
        .select(col("v"), col(idCol), col("change"),
          col("old_hash"), col("new_hash"))
    }
    // per-version metadata memoized across steps: each interior
    // generation is side b of one step and side a of the next — without
    // the memo its leaf walk and digest parse would run twice
    val resolvedMemo =
      scala.collection.mutable.Map.empty[Long, Option[Map[String, Long]]]
    val digestMemo = scala.collection.mutable.Map
      .empty[Long, Option[(String, Map[String, (Long, Long)])]]
    def resolvedOf(v: Long): Option[Map[String, Long]] =
      resolvedMemo.getOrElseUpdate(v, {
        val p = new org.apache.hadoop.fs.Path(root, s"v=$v")
        val ls = graft.GenSwap.leaves(fs, p)
        if (ls.exists(!_._2)) None
        else Some(ls.collect { case (rel, true) => rel -> v }.toMap ++
          readRefs(fs, p))
      })
    def digestOf(v: Long): Option[(String, Map[String, (Long, Long)])] =
      digestMemo.getOrElseUpdate(v,
        readDigest(fs, new org.apache.hadoop.fs.Path(root, s"v=$v")))
    def step(v: Long): DataFrame =
      stepChanges(spark, root, rootDir, v - 1, v, idCol, contentCol,
          resolvedOf, digestOf)
        .withColumn("v", lit(v))
        .select(col("v"), col(idCol), col("change"),
          col("old_hash"), col("new_hash"))
    val versions = (fromVersion + 1 to toVersion)
    if (versions.length <= maxPlanSteps)
      versions.map(step).reduce(_.unionByName(_))
    else {
      import graft.Materialize.Ops
      // windows materialize independently (each a bounded plan); the
      // result unions materialized scans, not live diff branches.
      // FORCED: the materialization is the bounded-plan MECHANISM, not
      // an optimization — under spark.graft.materialize=none a plain
      // materialize() is a pass-through and the O(steps)-branch plan
      // this exists to prevent would silently come back. Cost notes in
      // the scaladoc: construction executes the diffs eagerly, and the
      // window blocks stay pinned until Materialize.release — a
      // long-lived consumer should drain [[changesBetweenPaged]]
      // instead.
      versions.grouped(maxPlanSteps)
        .map(w => w.map(step).reduce(_.unionByName(_)).materializeForced())
        .reduce(_.unionByName(_))
    }
  }

  /** The long-range drain as a LAZY page iterator: one DataFrame per
    * `maxPlanSteps`-wide window of feed steps, each a bounded fresh plan
    * over live files — no materialization, no pinned blocks, no eager
    * compute at construction. This is the DR/catch-up shape: process a
    * page, commit your cursor, next(). The concatenation of all pages
    * equals `changesBetween(from, to)` row-for-row (pages partition the
    * same per-step diffs). Metadata memoization is per page; the only
    * repeat work is re-resolving each page-BOUNDARY generation (one
    * listing + digest read per page), interior versions resolve once.
    */
  def changesBetweenPaged(spark: SparkSession, rootDir: String,
      fromVersion: Long, toVersion: Long,
      idCol: String, contentCol: String,
      maxPlanSteps: Int = 16): Iterator[DataFrame] = {
    require(maxPlanSteps >= 1, "maxPlanSteps must be at least 1")
    if (fromVersion == toVersion)
      Iterator.single(changesBetween(
        spark, rootDir, fromVersion, toVersion, idCol, contentCol))
    else (fromVersion until toVersion by maxPlanSteps.toLong).iterator
      .map { lo =>
        changesBetween(spark, rootDir, lo,
          math.min(lo + maxPlanSteps, toVersion), idCol, contentCol,
          maxPlanSteps)
      }
  }

  /** One feed step: diff generation `a` → `b` reading only the partition
    * dirs whose physical owner differs between the two resolved maps.
    */
  private def stepChanges(spark: SparkSession,
      root: org.apache.hadoop.fs.Path,
      rootDir: String, a: Long, b: Long,
      idCol: String, contentCol: String,
      resolvedOf: Long => Option[Map[String, Long]],
      digestOf: Long => Option[(String, Map[String, (Long, Long)])])
      : DataFrame = {
    // resolved partition map (rel dir -> physical owner version) comes
    // memoized from changesBetween. A generation with root-level data
    // files is unpartitioned — no dir granularity to prune on; fall
    // back to the full diff
    (resolvedOf(a), resolvedOf(b)) match {
      case (Some(ma), Some(mb)) =>
        val dirs0 = (ma.keySet ++ mb.keySet)
          .filter(d => ma.get(d) != mb.get(d))
        // digest skip: when BOTH generations carry content digests with
        // the same column fingerprint, drop every dir whose (count, xor)
        // agree — identical content diffs to nothing, so don't read it.
        // This is what makes the feed O(truly changed) across FULL
        // republishes, where every dir's owner differs by construction.
        val dirs =
          if (dirs0.isEmpty) dirs0
          else (digestOf(a), digestOf(b)) match {
            case (Some((fa, da)), Some((fb, db))) if fa == fb =>
              // rel-dir keys on both sides — never a parsed or
              // re-inferred value, so the forms cannot desync
              dirs0.filterNot(d => da.get(d).exists(x => db.get(d).contains(x)))
            case _ => dirs0
          }
        def side(m: Map[String, Long]): Option[DataFrame] = {
          val mine = dirs.toSeq.flatMap(d => m.get(d).map(d -> _)).sorted
          if (mine.isEmpty) None
          else Some(mine.groupBy(_._2).toSeq.map { case (owner, rels) =>
            val base = new org.apache.hadoop.fs.Path(root, s"v=$owner")
            spark.read.option("basePath", base.toString)
              .parquet(rels.map(r =>
                new org.apache.hadoop.fs.Path(base, r._1).toString): _*)
          }.reduce(_.unionByName(_, allowMissingColumns = true))
            .select(col(idCol), col(contentCol)))
        }
        (side(ma), side(mb)) match {
          case (None, None) =>
            // physically identical generations (e.g. a re-pointed or
            // pure-metadata step): no changes by construction
            val e = readVersion(spark, rootDir, Some(b))
              .select(col(idCol), col(contentCol)).limit(0)
            snapshotDiff(e, e, idCol, contentCol)
          case (sa, sb) =>
            val template = sa.orElse(sb).get.limit(0)
            snapshotDiff(sa.getOrElse(template), sb.getOrElse(template),
              idCol, contentCol)
        }
      case _ =>
        snapshotDiff(
          readVersion(spark, rootDir, Some(a)),
          readVersion(spark, rootDir, Some(b)), idCol, contentCol)
    }
  }

  /** Cursor form of the change feed — what a polling consumer calls with
    * the last version it processed: returns `(changes, newCursor)` where
    * `changes` is [[changesBetween]]`(lastSeen, current)` and the cursor
    * to persist is the current version. After a ROLLBACK the pointer is
    * BELOW the consumer's cursor: the feed then returns one catch-down
    * step — the direct diff from the consumer's version to the current
    * one, labeled with the current version — so the consumer un-applies
    * the rolled-back-over content the same way it applies forward
    * changes, and its cursor moves to the rolled-back-to version.
    */
  /** Cursor form of the paged drain — [[changesSince]] for a consumer
    * that may be arbitrarily far behind: pages of at most `maxPlanSteps`
    * steps plus the new cursor to persist AFTER draining every page.
    * The rollback catch-down case is inherently one step and returns a
    * single page. Lazy: nothing is read until a page is consumed.
    */
  def changesSincePaged(spark: SparkSession, rootDir: String,
      lastSeen: Long, idCol: String, contentCol: String,
      maxPlanSteps: Int = 16): (Iterator[DataFrame], Long) = {
    val cur = currentVersion(spark, rootDir).getOrElse(
      throw new IllegalStateException(
        s"Lake: $rootDir has no published version"))
    if (cur >= lastSeen)
      (changesBetweenPaged(spark, rootDir, lastSeen, cur, idCol,
        contentCol, maxPlanSteps), cur)
    else {
      val (catchDown, c) =
        changesSince(spark, rootDir, lastSeen, idCol, contentCol)
      (Iterator.single(catchDown), c)
    }
  }

  /** Standing feed consumer with a crash-safe persisted cursor — the
    * reference's cdc.py main loop (poll binlog → apply → commit offset)
    * at the lake surface. One call = one catch-up to the current
    * version: resume from `cursorFile`, drain the range in bounded
    * pages, call `handler(page, pageEndVersion)` per page, and advance
    * the cursor AFTER the handler returns — at-least-once delivery: a
    * crash between handler and cursor write re-delivers exactly that
    * page on the next call, never skips one. The cursor write is
    * atomic (temp + rename — same store caveats as the lake's own
    * pointers). A missing cursor file initializes at the CURRENT
    * version and delivers nothing ("tail from now"); a consumer that
    * needs history bootstraps from a snapshot read first, exactly like
    * a CDC replica. After a rollback the single catch-down page is
    * delivered and the cursor moves DOWN with it. Returns the number
    * of pages delivered; the caller owns the polling schedule.
    *
    * Crash-during-INITIAL-cursor-creation caveat: a lone `.tmp` whose
    * payload parses is adopted even without its terminator (discarding
    * it could skip a pre-upgrade committed range — the forbidden
    * direction), so a consumer whose very first `writeCursor` crashed
    * mid-write may be handed pages of pre-subscription history before
    * catching up. That is the at-least-once direction: handlers must be
    * idempotent against re-delivery anyway, and the adoption is loud.
    */
  def followChanges(spark: SparkSession, rootDir: String,
      cursorFile: String, idCol: String, contentCol: String,
      maxPlanSteps: Int = 16)(
      handler: (DataFrame, Long) => Unit): Int = {
    val cPath = new org.apache.hadoop.fs.Path(cursorFile)
    val tmpPath = new org.apache.hadoop.fs.Path(
      cPath.getParent, cPath.getName + ".tmp")
    val cfs = cPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the cursor's crash safety is built on temp+delete+rename, which is
    // atomic on HDFS/local but NOT on bare object stores — fail fast on
    // those schemes (r16 verdict #7), exactly as the lake pointers do
    graft.GenSwap.requireAtomicFs(cfs, cPath.getParent,
      "Lake.followChanges (cursor temp+rename)")
    def writeCursor(v: Long): Unit = {
      val os = cfs.create(tmpPath, true)
      // trailing "\n" is the payload TERMINATOR: a crash mid-write can
      // leave a truncated decimal prefix that still parses ("15" cut to
      // "1"), and the lone-tmp recovery below must be able to tell a
      // complete value from a prefix (r17 advice)
      try os.write((v.toString + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      if (cfs.exists(cPath)) cfs.delete(cPath, false): Unit
      if (!cfs.rename(tmpPath, cPath)) throw new java.io.IOException(
        s"Lake.followChanges: cursor rename failed ($tmpPath -> $cPath)")
    }
    def readLongFile(p: org.apache.hadoop.fs.Path): Long = {
      val in = cfs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
    val cur = currentVersion(spark, rootDir).getOrElse(
      throw new IllegalStateException(
        s"Lake: $rootDir has no published version"))
    // crash recovery BEFORE the missing-cursor check: a crash between
    // the delete and the rename leaves only the fully-written `.tmp` —
    // treating that as a fresh consumer would silently SKIP the
    // undelivered range under tail-from-now init. Adopt the tmp value
    // (it is the post-page cursor the crashed call was committing) —
    // but only if it PARSES (r16 advice): a crash mid-write during the
    // INITIAL tail-from-now cursor creation (no main file ever existed)
    // leaves a partial/empty tmp, and adopting that would poison every
    // later read with NumberFormatException. Nothing was committed in
    // that history, so fresh-consumer init is the correct fallthrough.
    // The trailing "\n" TERMINATOR writeCursor appends (r17 advice)
    // distinguishes a committed value from a truncated decimal PREFIX
    // ("15\n" cut to "1") — a terminated tmp adopts silently. An
    // UNTERMINATED parsing tmp still adopts, LOUDLY: it may be a
    // truncated prefix (over-delivery — the at-least-once direction) or
    // a complete pre-terminator cursor from an older binary, and
    // discarding the latter would SKIP its committed undelivered range
    // — the one direction the delivery contract forbids (a truncated
    // prefix only ever re-delivers pages, never skips one).
    // When BOTH exist (crash between tmp write and delete), the main
    // file wins: it is the older value, and re-delivering one page is
    // the at-least-once contract — skipping would not be.
    if (!cfs.exists(cPath) && cfs.exists(tmpPath)) {
      // only a VANISHED tmp falls through (someone released the race);
      // any other read error PROPAGATES — collapsing a transient I/O
      // blip into "unparseable" would delete a committed cursor and
      // silently skip its undelivered range, the one direction the
      // delivery contract forbids (r18 review-2 #3). The caller's next
      // poll retries against the still-present tmp.
      val text: Option[String] =
        try {
          val in = cfs.open(tmpPath)
          try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.FileNotFoundException => None }
      val parses = text.flatMap(_.trim.toLongOption)
      if (parses.isDefined && text.exists(!_.endsWith("\n")))
        System.err.println(
          s"[lake] followChanges: adopting UNTERMINATED cursor tmp " +
            s"$tmpPath (value ${parses.get}) — either a pre-upgrade " +
            "cursor or a truncated prefix; deliveries resume from it " +
            "(at-least-once: a prefix can only re-deliver, never skip)")
      if (parses.isEmpty) {
        System.err.println(
          s"[lake] followChanges: discarding unparseable cursor tmp " +
            s"$tmpPath (crash mid-initial-write) — fresh-consumer init")
        cfs.delete(tmpPath, false): Unit
      } else if (!cfs.rename(tmpPath, cPath)) throw new java.io.IOException(
        s"Lake.followChanges: cursor recovery failed ($tmpPath -> $cPath)")
    }
    if (!cfs.exists(cPath)) { writeCursor(cur); return 0 }
    val seen = readLongFile(cPath)
    if (cur == seen) 0
    else if (cur < seen) {
      // rollback catch-down: one reverse page, cursor moves DOWN
      val (page, c) = changesSince(spark, rootDir, seen, idCol, contentCol)
      handler(page, c)
      writeCursor(c)
      1
    } else {
      var pages = 0
      for (lo <- seen until cur by maxPlanSteps.toLong) {
        val hi = math.min(lo + maxPlanSteps, cur)
        handler(changesBetween(spark, rootDir, lo, hi, idCol, contentCol,
          maxPlanSteps), hi)
        writeCursor(hi) // per PAGE: a crash re-delivers only this page
        pages += 1
      }
      pages
    }
  }

  def changesSince(spark: SparkSession, rootDir: String, lastSeen: Long,
      idCol: String, contentCol: String): (DataFrame, Long) = {
    val cur = currentVersion(spark, rootDir).getOrElse(
      throw new IllegalStateException(
        s"Lake: $rootDir has no published version"))
    if (cur >= lastSeen)
      (changesBetween(spark, rootDir, lastSeen, cur, idCol, contentCol), cur)
    else {
      val catchDown =
        diffVersions(spark, rootDir, lastSeen, cur, idCol, contentCol)
          .withColumn("v", lit(cur))
          .select(col("v"), col(idCol), col("change"),
            col("old_hash"), col("new_hash"))
      (catchDown, cur)
    }
  }

  /** Point the lake back at an already-published generation — one atomic
    * pointer flip, no data movement. The rolled-back-over generations
    * stay on disk and remain pinned-readable (they are below the
    * high-water) until retention prunes them; the next publish allocates
    * above them, never reusing a number.
    */
  def rollbackTo(spark: SparkSession, rootDir: String, version: Long): Unit =
    guarded(spark, rootDir) {
      val (fs, root) = fsOf(spark, rootDir)
      recoverPointers(fs, root)
      if (highWater(fs, root).forall(_ < version))
        throw new IllegalStateException(
          s"Lake: cannot rollback $rootDir to v=$version — never published " +
            s"(high-water=${highWater(fs, root).orNull})")
      val dir = new org.apache.hadoop.fs.Path(root, s"v=$version")
      if (!fs.exists(dir)) throw new IllegalStateException(
        s"Lake: cannot rollback $rootDir to v=$version — not on disk " +
          "(pruned or never published)")
      flipPointer(fs, root, CurrentPointer, version)
    }

  /** Explicit retention GC — the VACUUM an operator runs to reclaim
    * space without publishing (publish-time pruning only fires when new
    * data ships; shrinking the retention window, or cleaning up after a
    * rollback or a crashed publish, should not require a fake publish).
    * Deletes every on-disk generation that is not protected and returns
    * the decision ledger — one row per generation:
    * `(v, action, reason, n_files, bytes)` with `action` ∈
    * retained|pruned|orphan_removed and `reason` naming WHY a retained
    * generation survives: `horizon` (within the last `keep` published),
    * `current` (the pointer's target — NEVER pruned, even when a
    * rollback left it below the horizon), or `referenced` (a physical
    * donor some retained delta inherits partition dirs from — flattened
    * refs, so one level resolves reachability, same rule as
    * publish-time pruning). Generations above the published high-water
    * are crashed publishes' orphans and are removed (they were never
    * readable). File/byte accounting is the listing walk (metadata
    * only, O(on-disk generations)). Refused-publish quarantines
    * (under `_QUARANTINE_REFUSED`) ride the same horizon: the newest `keep`
    * refusal audits are retained, older ones pruned, each with a
    * `refused_retained`/`refused_pruned` ledger row — the only GC those
    * audit dirs have.
    *
    * Writer op under the single-writer contract: a live publisher's
    * in-flight generation is indistinguishable from a crashed orphan.
    * ENFORCED, not conventional (r15 verdict #3): vacuum takes
    * [[guarded]]'s `_LOCK` itself, as does every mutating publish — a
    * vacuum beside a live publisher fails loudly instead of silently
    * deleting its in-flight generation.
    */
  def vacuum(spark: SparkSession, rootDir: String, keep: Int): DataFrame = {
    require(keep >= 1, "vacuum must retain at least the current generation")
    guarded(spark, rootDir) {
    val (fs, root) = fsOf(spark, rootDir)
    recoverPointers(fs, root)
    val cur = readPointer(fs, root, CurrentPointer)
    val high = highWater(fs, root)
    val gens = genDirs(fs, root).sortBy(_._1)
    // ledger first (one tiny read per generation — written at publish),
    // walk only for pre-upgrade generations and the refusal-audit dirs
    def sizeOf(p: org.apache.hadoop.fs.Path): (Long, Long) =
      readSizeFile(fs, p).map { case (nf, nb, _) => (nf, nb) }
        .getOrElse(physicalSize(fs, p))
    val hw = high.getOrElse(-1L)
    val protectedWhy = scala.collection.mutable.Map.empty[Long, String]
    for ((v, _) <- gens if v <= hw && v > hw - keep)
      protectedWhy(v) = "horizon"
    for (c <- cur if !protectedWhy.contains(c)) protectedWhy(c) = "current"
    // flattened refs: one pass over the protected generations names every
    // physical donor they reach
    for ((v, p) <- gens if protectedWhy.contains(v);
         o <- readRefs(fs, p).values if !protectedWhy.contains(o))
      protectedWhy(o) = "referenced"
    val rows = gens.map { case (v, p) =>
      val (nf, nb) = sizeOf(p)
      val (action, reason) =
        if (v > hw) ("orphan_removed", "above_high_water")
        else protectedWhy.get(v) match {
          case Some(why) => ("retained", why)
          case None => ("pruned", "outside_horizon")
        }
      if (action != "retained") fs.delete(p, true): Unit
      org.apache.spark.sql.Row(v, action, reason, nf, nb)
    }
    // refused-publish quarantines are audit, not data, and nothing else
    // reclaims them — without this they grow one dir per refused poison
    // batch forever. Same `keep` horizon, newest-first by the numeric id
    // in the name, applied PER KEY FAMILY (r16 advice): m=<batchId> and
    // v=<n>_a<k> ids are unrelated sequences, so a shared ordering could
    // prune a chronologically newer refusal of one family while retaining
    // older ones of the other. One ledger row each so the decision is
    // visible.
    val refusedHome = new org.apache.hadoop.fs.Path(
      root, RefusedQuarantineDir)
    val refusedRows = if (!fs.exists(refusedHome)) Nil else {
      def idOf(n: String): Long =
        "\\d+".r.findFirstIn(n).map(_.toLong).getOrElse(-1L)
      def familyOf(n: String): String = n.takeWhile(_ != '=')
      fs.listStatus(refusedHome).toSeq
        .groupBy(st => familyOf(st.getPath.getName))
        .toSeq.sortBy(_._1) // deterministic ledger order across families
        .flatMap { case (_, fam) =>
          fam.sortBy(st => (idOf(st.getPath.getName), st.getPath.getName))
            .reverse.zipWithIndex.map { case (st, i) =>
              val (nf, nb) = sizeOf(st.getPath)
              val action =
                if (i < keep) "refused_retained" else "refused_pruned"
              if (action == "refused_pruned")
                fs.delete(st.getPath, true): Unit
              org.apache.spark.sql.Row(
                idOf(st.getPath.getName), action, "refusal_audit", nf, nb)
            }
        }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("action",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("reason",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("n_files",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows ++ refusedRows, 1), schema)
    }
  }

  /** The lake's version ledger — one row per on-disk generation:
    * `(v, published, current, batch_id, n_rows, n_files, bytes,
    * n_refs)`. The audit surface a DESCRIBE HISTORY gives a table
    * format: what shipped, what is current, what a rollback would
    * return to, which stream batch produced it. `published=false` marks
    * a crashed publish's orphan awaiting cleanup. Accounting is the
    * generation's OWN physical payload (a delta generation shows its
    * changed partitions; `n_refs` counts the partition dirs it inherits
    * — resolve logical content with [[readVersion]]). Files/bytes come
    * from the listing (metadata only); `n_rows` is one count per
    * generation — parquet footer arithmetic, no column read — bounded
    * by the retention horizon, so the op is O(keep), not O(corpus).
    *
    * Digest visibility (r15 verdict #7): `digest_fp` is the
    * generation's content-digest column fingerprint (null = published
    * without digests) and `digest_skip_from_prev` says whether a feed
    * step INTO this generation can digest-skip — both it and the
    * previous on-disk generation carry digests with the SAME
    * fingerprint. A schema change (or a digest-less publish) silently
    * degrades cross-republish skipping to full diffs; this column is
    * where an operator SEES that — a feed that got slower shows
    * `false` at the version that broke the fingerprint chain.
    */
  def history(spark: SparkSession, rootDir: String): DataFrame = {
    val (fs, root) = fsOf(spark, rootDir)
    val cur = readPointer(fs, root, CurrentPointer)
    val high = highWater(fs, root)
    val fpOf = scala.collection.mutable.Map.empty[Long, Option[String]]
    def digestFp(v: Long): Option[String] =
      fpOf.getOrElseUpdate(v, readDigest(fs,
        new org.apache.hadoop.fs.Path(root, s"v=$v")).map(_._1))
    // ONE root listing: the row walk and the predecessor-existence set
    // must come from the same snapshot, or a generation pruned between
    // two listings would make digest_skip_from_prev claim Some(false)
    // for a predecessor the walk no longer sees (contract: None when
    // there is no predecessor on disk)
    val listed = genDirs(fs, root).sortBy(_._1)
    val onDisk = listed.map(_._1).toSet
    val rows = listed.flatMap { case (v, p) =>
      try {
        // the publish-time size ledger replaces both the per-generation
        // file walk AND the per-generation Spark count() job (r17
        // verdict #2 — at a year of hourly publishes history() was
        // O(gens × files) listings + O(gens) count jobs per call);
        // pre-upgrade generations fall back to exactly those
        val (nf, nb, nRows) = readSizeFile(fs, p).getOrElse {
          val (f, b) = physicalSize(fs, p)
          // a crashed orphan can be an empty dir — don't schema-infer it
          (f, b, if (f == 0) 0L else spark.read.parquet(p.toString).count())
        }
        val batchId = readLong(fs,
          new org.apache.hadoop.fs.Path(p, BatchMarker))
        val fp = digestFp(v)
        val skipFromPrev: Option[Boolean] =
          if (!onDisk.contains(v - 1)) None
          else Some(fp.nonEmpty && fp == digestFp(v - 1))
        Some((v, high.exists(v <= _), cur.contains(v), batchId, nRows, nf,
          nb, readRefs(fs, p).size.toLong, fp, skipFromPrev))
      } catch {
        // a generation pruned (or a crashed orphan cleaned) between the
        // root listing and this walk simply drops out of the ledger —
        // the same listed-then-moved race any directory listing has
        case _: java.io.FileNotFoundException => None
      }
    }
    import spark.implicits._
    rows.toDF("v", "published", "current", "batch_id", "n_rows",
      "n_files", "bytes", "n_refs", "digest_fp", "digest_skip_from_prev")
  }

  /** Continuous publishing: every non-empty micro-batch of `df` (a
    * STREAMING DataFrame) ships as one immutable generation — the
    * curated-drop pattern where each batch IS a complete dataset drop
    * (a day's curation output, a backfill segment), consumers read the
    * current drop through the pointer, and any drop within retention is
    * pinned-readable / rollback-able.
    *
    * EXACTLY-ONCE currency under replay, from two pieces already in the
    * protocol: (1) [[publishVersion]] stamps the batch id INSIDE the
    * generation before the high-water flip, so a generation counted
    * published always names its batch; (2) a replayed batch first reads
    * the high-water generation's stamp — if it matches, the data landed
    * before the crash and the replay only re-points `_CURRENT` (pure
    * metadata); if the crash hit before the high-water flip, the partial
    * generation is an unpublished orphan that publishVersion's own
    * cleanup removes before re-publishing. No crash point yields a
    * duplicated or half-published drop.
    *
    * The stream OWNS the root (the single-writer contract every lake
    * mutator carries): a manual publishVersion interleaved with a live
    * publisher has no batch stamp, so a later crash-replay could not
    * see it as newer and would re-point currency at the replayed drop.
    * Rollback while the stream is STOPPED composes fine — the next
    * drop's id is above the stamp, so it publishes normally above the
    * rolled-back-to generation.
    */
  def publishStream(df: DataFrame, rootDir: String, checkpointDir: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int = 3,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      delta: Boolean = false,
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // the lock-owner token is this query's checkpoint location — stable
    // across restarts, unique per query — set BEFORE start so the
    // stream's cloned session carries it into every batch's guarded
    // acquire; the crashed incarnation's lock is then self-reclaimed on
    // restart instead of demanding a hand-deleted _LOCK
    setLockOwner(df.sparkSession, rootDir, checkpointDir)
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, rootDir, partitionCols, sortCols,
          maxRecordsPerFile, keep, batchId, delta, digest,
          expect, onViolation)
      }
      .start()
  }

  /** One micro-batch of [[publishStream]] — also the direct entry for a
    * caller replaying a committed batch by hand. Idempotent on
    * `batchId`: see publishStream's exactly-once note. With
    * `delta = true` each batch ships as a DELTA generation (only its
    * partitions written, the rest inherited from the then-current
    * generation — the continuous-curation production shape: publish the
    * full base once, then stream partition-scoped drops at O(changed)
    * each); the base must exist before the stream's first batch.
    */
  private[graft] def publishBatch(batch: DataFrame, rootDir: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int, batchId: Long,
      delta: Boolean = false, digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail"): Unit = {
    val spark = batch.sparkSession
    // the guard spans the replay check AND the publish (the replay check
    // recovers/flips pointers); the inner acquire is reentrant
    guarded(spark, rootDir) {
      val (fs, root) = fsOf(spark, rootDir)
      recoverPointers(fs, root)
      // AvailableNow ends with a trailing empty batch — an empty drop is
      // not a dataset version, skip it (the marker is untouched, so a
      // replayed empty batch skips again)
      if (!replayedBatch(fs, root, batchId) && !batch.isEmpty) {
        // expectation note for streams: fail-mode rejection throws inside
        // foreachBatch and FAILS THE QUERY (a poison batch must not be
        // silently skipped — the checkpoint keeps the offset, so the fixed
        // producer replays the same batch); drop-mode quarantines per drop
        if (delta)
          publishDelta(batch, rootDir, partitionCols, sortCols,
            maxRecordsPerFile, keep, genMarker = Some(batchId),
            digest = digest, expect = expect, onViolation = onViolation): Unit
        else
          try
            publishVersion(batch, rootDir, partitionCols, sortCols,
              maxRecordsPerFile, keep, genMarker = Some(batchId),
              digest = digest, expect = expect, onViolation = onViolation): Unit
          catch {
            // drop mode's contract is PROGRESS past bad rows. A full
            // publish whose EVERY row was quarantined is refused (an
            // empty full generation is unreadable), and without this
            // guard the refusal would fail the query and replay the
            // same poison batch forever — despite drop mode being
            // chosen precisely to keep going. The quarantine audit is
            // preserved under _QUARANTINE_REFUSED/m=<batchId> (replay-
            // idempotent) by publishVersion itself; skip the batch
            // LOUDLY and let the stream advance. Fail mode keeps the
            // poison-batch stop semantics. Matched by TYPE (r16 advice):
            // a reworded refusal message cannot break drop-mode progress.
            case e: RefusedPublishException if onViolation == "drop" =>
              System.err.println(
                s"[lake] publishStream batch $batchId: every row " +
                  s"quarantined — batch skipped, audit preserved " +
                  s"(${e.getMessage})")
          }
      }
    }
  }

  /** Replay guard shared by every streaming lake writer: true iff this
    * batch's generation already committed before a crash (or this is an
    * older batch's replay) — in which case nothing republishes and at
    * most the interrupted `_CURRENT` flip completes so the committed
    * drop is actually current.
    */
  private def replayedBatch(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, batchId: Long): Boolean = {
    val high = highWater(fs, root)
    val highStamp = high.flatMap(v => readLong(fs,
      new org.apache.hadoop.fs.Path(root, s"v=$v/$BatchMarker")))
    if (highStamp.exists(_ >= batchId)) {
      if (highStamp.contains(batchId) &&
          readPointer(fs, root, CurrentPointer) != high)
        flipPointer(fs, root, CurrentPointer, high.get)
      true
    } else false
  }

  /** Continuous MERGE: every non-empty micro-batch of `changes` (a
    * STREAMING changelog — the CDC pipeline's netted actions) applies
    * via [[mergeDelta]] as one immutable delta generation. This is the
    * reference's end-to-end loop (binlog → maintained queryable
    * replica) at the lake surface: O(touched partitions) per batch,
    * atomic batch visibility (a reader sees whole batches only), pinned
    * time travel to the replica as-of any batch within retention, and
    * O(1) rollback of a bad batch. Exactly-once under crash/replay by
    * the same batch-stamp protocol as [[publishStream]]; the stream
    * OWNS the root (single-writer contract). The base must be published
    * before the stream's first batch.
    */
  def mergeStream(changes: DataFrame, rootDir: String, checkpointDir: String,
      pkCols: Seq[String], partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int = 3,
      opCol: String = "op", seqCol: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    setLockOwner(changes.sparkSession, rootDir, checkpointDir) // see publishStream
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, rootDir, pkCols, partitionCols, sortCols,
          maxRecordsPerFile, keep, opCol, seqCol, batchId, digest,
          expect, onViolation)
      }
      .start()
  }

  /** One micro-batch of [[mergeStream]] — also the direct entry for a
    * caller replaying a committed batch by hand. Idempotent on
    * `batchId`: a replay of a committed merge only re-points currency;
    * a crash before the high-water flip left an unpublished orphan the
    * re-merge cleans and recomputes against the unchanged base.
    */
  private[graft] def mergeBatch(batch: DataFrame, rootDir: String,
      pkCols: Seq[String], partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long, keep: Int, opCol: String,
      seqCol: Option[String], batchId: Long,
      digest: Boolean = false,
      expect: Seq[(String, Column)] = Nil,
      onViolation: String = "fail"): Unit =
    // the guard spans the replay check AND the merge: the replay check
    // itself recovers/flips pointers, and the reentrant inner acquire in
    // mergeDelta is free
    guarded(batch.sparkSession, rootDir) {
      val (fs, root) = fsOf(batch.sparkSession, rootDir)
      recoverPointers(fs, root)
      if (!replayedBatch(fs, root, batchId) && !batch.isEmpty)
        mergeDelta(batch, rootDir, pkCols, partitionCols, sortCols,
          maxRecordsPerFile, keep, opCol, seqCol, probeMovers = false,
          genMarker = Some(batchId), digest = digest,
          expect = expect, onViolation = onViolation): Unit
    }

  /** Per-partition accounting of what landed: file/row/byte counts from
    * the written files themselves (not the writer's intent). File listing
    * goes through the Hadoop FileSystem API so the manifest is correct on
    * ANY store the write targeted (hdfs://, s3a://, file://) — a local-
    * only java.io listing would silently return an empty manifest on
    * object storage. Both join keys are normalized with the SAME
    * scheme-stripping rule, so they agree regardless of how each side
    * renders the URI.
    */
  def manifest(
      spark: SparkSession, outDir: String,
      partitionCols: Seq[String]): DataFrame = {
    // RFC 3986 scheme chars (ALPHA *(ALPHA/DIGIT/+/-/.)), case-insensitive
    // — the earlier [a-z0-9]+ missed legal schemes (e.g. "s3+custom",
    // uppercase), and a one-sided normalization miss silently dropped
    // files from the manifest via the inner join (now a left join that
    // fails loudly instead)
    def norm(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "(?i)^[a-z][a-z0-9+.-]*:/+", "/")
    val files = spark.read.parquet(outDir)
      .select(partitionCols.map(col) :+
        norm(input_file_name()).as("file"): _*)
      .groupBy((partitionCols :+ "file").map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val sizes = {
      import spark.implicits._
      val path = new org.apache.hadoop.fs.Path(outDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, /* recursive = */ true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          buf += ((st.getPath.toString, st.getLen))
      }
      buf.toSeq.toDF("file_uri", "n_bytes")
        .select(norm(col("file_uri")).as("file"), col("n_bytes"))
    }
    // left join + per-row null check: a normalization mismatch between
    // the two listings must FAIL the manifest, not shrink it — silent
    // file loss defeats the accounting this manifest exists to provide
    files
      .join(sizes, Seq("file"), "left")
      .select((partitionCols.map(col) :+ col("file") :+ col("n_rows") :+
        coalesce(col("n_bytes"), raise_error(concat(
          lit("Lake.manifest: no byte size for file "), col("file"),
          lit(" — scan/listing path normalization diverged"))))
          .as("n_bytes")): _*)
      .groupBy(partitionCols.map(col): _*)
      .agg(countDistinct("file").as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_bytes").as("n_bytes"))
  }

  /** Incremental small-file compaction — the `OPTIMIZE` maintenance pass a
    * 100 TB corpus needs between ingest cycles. Streaming sinks and
    * per-batch appends fragment partition dirs into thousands of small
    * files; every downstream scan then pays per-file open/footer cost and
    * the scheduler drowns in splits. This operator restores the
    * [[writeCurated]] layout contract WITHOUT rewriting the corpus:
    *
    *  - **decision is a metadata pass**: partition dirs are judged from the
    *    Hadoop FS listing alone (file counts + byte sizes — no data read,
    *    no footer open). A partition needs compaction when its file count
    *    exceeds the ideal `ceil(bytes / targetBytes)` beyond `slackPct`
    *    (+1 for range-boundary tasks, see below), or when any single file
    *    is > 2× target (the unsplittable-hot-spot case — rewriting splits
    *    it back into parallel-scannable units).
    *  - **rewrite is O(touched bytes)**: only degenerate partitions are
    *    read (partition-pruned scan) and re-landed — settled partitions'
    *    files are never opened, moved, or rewritten (byte-identity is
    *    spec-pinned).
    *  - **the rewrite is a versioned generation + atomic swap**
    *    ([[graft.GenSwap]]): the compacted output lands in a hidden
    *    sibling dir inside the root while the source files stay untouched
    *    for the whole job (pure lineage over stable files — no checkpoint
    *    of any kind), then each touched partition dir swaps in with two
    *    metadata renames. A concurrent reader never observes a mixed or
    *    half-rewritten partition — each leaf it reads is all-old or
    *    all-new (it can still briefly see a leaf absent between the two
    *    renames, or lose already-listed files to the swap — retry; see
    *    [[graft.GenSwap]]'s reader guarantee), and a crash at any point
    *    is healed by the next run's recovery sweep — the in-place
    *    dynamic-overwrite design this replaced could lose or duplicate
    *    rows if its forced local checkpoint lost blocks mid-overwrite,
    *    and exposed PARTIAL file sets to concurrent listers.
    *  - **output layout is the one a scan wants**: touched rows are
    *    range-partitioned on `partitionCols ++ sortCols` into
    *    `ceil(touchedBytes / targetBytes)` tasks, so files land
    *    ~target-sized AND range-disjoint on the sort key within each
    *    partition — the zone-map quality `q26_zorder` measures comes back
    *    for free, and a task never writes to more than the two partitions
    *    its range boundary straddles (hence the +1 file slack in the
    *    idempotence test: a re-run on a freshly compacted dir is a no-op).
    *
    * Returns a per-partition report (partition values as path-derived
    * strings, `action` ∈ compacted|kept, file/byte counts before and
    * after). Driver memory is O(#partition dirs) — the same bounded
    * catalog-listing class as [[manifest]]'s join keys. Hive-style
    * `%XX`-escaped partition values are decoded; `__HIVE_DEFAULT_PARTITION__`
    * maps to null. Sizes compare compressed input bytes to a same-codec
    * output, so the ideal-count estimate is stable across runs.
    */
  def compact(
      spark: SparkSession,
      dir: String,
      partitionCols: Seq[String],
      sortCols: Seq[String],
      targetBytes: Long,
      slackPct: Double = 0.25,
      zOrderCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(partitionCols.nonEmpty || sortCols.nonEmpty,
      "compact needs at least one partition or sort column")
    // compact is a MUTATING maintenance pass — the original accident
    // class the writer guard was built for — so it takes the guard on
    // its target dir itself (reentrant for callers already holding it).
    // Note the lock scope is `dir`: compacting a generation INSIDE a
    // versioned lake (dir = <lake>/v=N) excludes other writers of that
    // dir, but coordination with the lake-ROOT writers (retention could
    // prune v=N mid-compact) needs `guarded(<lake root>)` around the
    // call — the generation dir and the root are different lock
    // domains by design (a root-level lock here would serialize
    // compactions of sibling generations for no reason).
    guarded(spark, dir) {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal any crashed prior pass BEFORE judging: a leftover generation
    // dir must neither pollute the stats nor shadow restored partitions
    graft.GenSwap.recover(fs, root)

    def stats(): Map[Seq[Option[String]], (Long, Long, Long)] = {
      val rootUri = fs.makeQualified(root).toUri
      val it = fs.listFiles(root, /* recursive = */ true)
      val acc = scala.collection.mutable.Map
        .empty[Seq[Option[String]], (Long, Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") && !name.startsWith(".") &&
            !name.startsWith("_")) {
          val rel = rootUri.relativize(fs.makeQualified(st.getPath).toUri)
            .getPath
          val dirsOnPath = rel.split('/').dropRight(1)
          // skip anything inside hidden/metadata dirs (staging leftovers)
          // — Spark's own listing ignores them, so must the accounting
          if (!dirsOnPath.exists(d => d.startsWith(".") || d.startsWith("_"))) {
            val vals = partitionCols.map { c =>
              dirsOnPath.collectFirst {
                case seg if seg.startsWith(c + "=") =>
                  unescapePartitionValue(seg.substring(c.length + 1))
              }.getOrElse(throw new IllegalStateException(
                s"compact: file $rel has no '$c=' dir — partitionCols do " +
                  "not match the layout"))
            }
            val (n, bytes, mx) = acc.getOrElse(vals, (0L, 0L, 0L))
            acc(vals) = (n + 1, bytes + st.getLen, math.max(mx, st.getLen))
          }
        }
      }
      acc.toMap
    }

    val before = stats()
    def ideal(bytes: Long): Long = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    def degenerate(s: (Long, Long, Long)): Boolean = {
      val (nFiles, nBytes, maxB) = s
      val allowed = ideal(nBytes) +
        math.max(1L, math.ceil(ideal(nBytes) * slackPct).toLong)
      nFiles > allowed || maxB > 2 * targetBytes
    }
    val touched = before.filter { case (_, s) => degenerate(s) }

    if (touched.nonEmpty) {
      // partition-pruned read of ONLY the degenerate partitions: the
      // predicate references partition columns alone, so
      // PruneFileSourcePartitions drops settled dirs before any task runs
      val all = spark.read.parquet(dir)
      val pred =
        if (partitionCols.isEmpty) lit(true)
        else touched.keys.map { vals =>
          partitionCols.zip(vals).map { case (c, v) =>
            v.map(col(c).cast("string") === lit(_)).getOrElse(col(c).isNull)
          }.reduce(_ && _)
        }.reduce(_ || _)
      val touchedBytes = touched.valuesIterator.map(_._2).sum
      val nTasks = math.max(1L, ideal(touchedBytes)).toInt
      // OPTIMIZE ZORDER: the maintenance pass is where re-clustering
      // belongs (the ingest path wrote arrival order; the compactor is
      // already rewriting the touched bytes) — with zOrderCols the
      // touched rows sort by the interleaved z-value instead of the
      // plain sort keys; the boundaries pass reads only the z columns
      // of the touched partitions
      val touchedRows =
        if (zOrderCols.isEmpty) all.filter(pred)
        else graft.operators.ZOrder.withZ(all.filter(pred), zOrderCols)
      val keys =
        if (zOrderCols.isEmpty) (partitionCols ++ sortCols).map(col)
        else partitionCols.map(col) :+ col("_graft_z")
      // stage the compacted generation in a hidden sibling, then swap:
      // the source files stay on disk untouched for the whole write, so
      // the plan is pure lineage over stable files — no checkpoint, no
      // dependency on executor-pinned blocks while the corpus mutates
      val g = graft.GenSwap.begin(spark, dir)
      try {
        val writer = touchedRows
          .repartitionByRange(nTasks, keys: _*)
          .sortWithinPartitions(keys: _*)
          .drop("_graft_z")
          .write.mode(SaveMode.Overwrite)
        (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
         else writer).parquet(g.genDir)
        graft.GenSwap.commit(g)
      } catch { case t: Throwable => graft.GenSwap.abort(g); throw t }
    }

    val after = stats()
    // a compact changes the dir's physical footprint — refresh the size
    // ledger so vacuum/history keep reading truth (only when one exists:
    // compact's target may be any dir, not just a lake generation).
    // Keyed on LEDGER-vs-DISK disagreement, not on touched.nonEmpty: a
    // crash between a committed swap and the refresh leaves a stale
    // ledger that a re-run (which finds nothing left to compact) must
    // still repair (r18 review #6). Rows are preserved — compact
    // rewrites files, never row content — so the recheck is one listing,
    // no Spark job. A PRESENT-but-unparseable ledger (crash mid-_SIZE
    // write) heals with a full rebuild including the row recount —
    // leaving it would pin vacuum/history to the walk fallback forever
    // (r18 review-2 #7).
    val sizePath = new org.apache.hadoop.fs.Path(root, SizeFile)
    readSizeFile(fs, root) match {
      case Some((sf, sb, srows)) =>
        val (nf, nb) = physicalSize(fs, root)
        if (nf != sf || nb != sb) writeSizeEntries(fs, root, nf, nb, srows)
      case None if fs.exists(sizePath) => writeSizeFile(spark, fs, root)
      case None => () // not a lake generation — no ledger to maintain
    }
    val schema = org.apache.spark.sql.types.StructType(
      partitionCols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType)) ++ Seq(
        org.apache.spark.sql.types.StructField("action",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("files_before",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes_before",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("files_after",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes_after",
          org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = before.toSeq.map { case (vals, (nF, nB, _)) =>
      val (aF, aB, _) = after.getOrElse(vals, (0L, 0L, 0L))
      val action = if (touched.contains(vals)) "compacted" else "kept"
      org.apache.spark.sql.Row.fromSeq(
        vals.map(_.orNull) ++ Seq(action, nF, nB, aF, aB))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    }
  }

  /** Hive path-escaping inverse: `%XX` percent-decode only ('+' stays
    * literal — URLDecoder's form-decoding rule would corrupt it), and the
    * null-partition sentinel maps back to None.
    */
  private[graft] def unescapePartitionValue(s: String): Option[String] = {
    if (s == "__HIVE_DEFAULT_PARTITION__") None
    else if (!s.contains('%')) Some(s)
    else {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        val ch = s.charAt(i)
        if (ch == '%' && i + 3 <= s.length) {
          // a '%' at the tail with fewer than 2 hex chars left is literal
          val hex = s.substring(i + 1, i + 3)
          try {
            out.write(Integer.parseInt(hex, 16)); i += 3
          } catch {
            case _: NumberFormatException => out.write(ch.toInt); i += 1
          }
        } else { out.write(ch.toInt); i += 1 }
      }
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * audit a training pipeline runs before switching its data dependency:
    * which documents were ADDED, REMOVED, or CHANGED between snapshot A
    * and snapshot B. Unchanged rows are excluded from the output — at
    * 100 TB they are the overwhelming majority, and the diff's value is
    * its smallness (the changed set is what re-enters dedup/decontam and
    * what a reproducibility report cites).
    *
    * Scale shape: content reduces to an md5 MAP-SIDE before the join, so
    * the single full-outer shuffle on the id carries (id, 32-char hash)
    * rows — document bodies never move. Snapshots already bucketed on the
    * id (the [[writeCurated]] layout sorted/partitioned by key) diff with
    * zero exchange; otherwise this is one minimal id-keyed join.
    */
  def snapshotDiff(oldV: DataFrame, newV: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    // presence is carried EXPLICITLY (not inferred from a null hash): a
    // document whose content is NULL hashes to NULL, and hash-null-means-
    // absent would misread it as added/removed; <=> (null-safe equality)
    // then treats null-vs-null content as unchanged and null-vs-value as
    // changed, matching SQL IS DISTINCT FROM
    val o = oldV.select(col(idCol), md5(col(contentCol)).as("old_hash"),
      lit(true).as("_in_old"))
    val n = newV.select(col(idCol), md5(col(contentCol)).as("new_hash"),
      lit(true).as("_in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(!(col("old_hash") <=> col("new_hash")), lit("changed"))
          .otherwise(lit("unchanged")).as("change"),
        col("old_hash"), col("new_hash"))
      .filter(col("change") =!= "unchanged")
  }
}
