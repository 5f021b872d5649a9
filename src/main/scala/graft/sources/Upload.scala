package graft.sources

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** K4/K5 — the dump pipeline's cloud legs, re-expressed over the PUBLIC
  * Hadoop FileSystem API instead of shelled-out cloud CLIs.
  *
  * The reference uploads date-grouped CSV dumps with `gsutil -m cp -n -L`
  * (skip files already at the destination, record a transfer log,
  * 3 tries — dump2csv.py:119-138) and then loads each uploaded file into
  * the warehouse exactly once, tracking completed loads in a side log and
  * set-differencing against it on every cycle (dump2csv.py:216-267).
  *
  * Spark shape: the transport is `FileUtil.copy` over whatever FileSystem
  * the destination URI resolves to — file:// in tests, hdfs://, s3a://,
  * or gs:// wherever the corresponding public Hadoop connector is on the
  * classpath — so the SAME code is the local smoke test and the cloud
  * uploader. The one thing that stays external is the warehouse's own
  * load command (the reference shells out to the `bq` CLI): [[pendingLoads]]
  * computes the exactly-once load plan and renders the command line; the
  * caller's scheduler executes it and acks with [[markLoaded]].
  *
  * Crash-safety improvement over the reference: files land as
  * `<name>.inprogress` and are renamed into place only when complete, so
  * the skip-existing check can never mistake a half-written file for a
  * finished upload (the reference's `-n` would).
  */
object Upload {

  /** One file's transfer outcome — the `upload.info` row shape. The load
    * step re-parses Source/Destination from this log, exactly as the
    * reference parses gsutil's `-L` log (dump2csv.py:199-206, 227-229).
    */
  final case class UploadRecord(
      source: String, destination: String, sourceSize: Long,
      bytesTransferred: Long, result: String, description: String)

  /** Failure-injection seam for the retry spec (the
    * [[graft.streaming.CdcStream.afterStageHook]] technique): invoked
    * before each copy attempt with (source, destination). Production
    * never touches it.
    */
  private[graft] var beforeCopyHook: (String, String) => Unit = (_, _) => ()

  private def infoPath(dateDir: Path) = new Path(dateDir, "upload.info")
  private def loadLogPath(dateDir: Path) = new Path(dateDir, "bqload.info")

  // log fields are URIs, sizes, and short statuses; commas/newlines in
  // the free-text description are sanitized instead of CSV-quoted
  private def sanitize(s: String): String =
    s.replaceAll("[,\r\n]", " ").take(200)

  /** K4 (dump2csv.py:119-138): upload one date directory's `*.csv` files
    * to `<destRoot>/<date>/`. Semantics preserved from the reference:
    * files already at the destination are SKIPPED (`-n`); every file's
    * outcome is recorded to `<dateDir>/upload.info` (`-L`); each file
    * gets up to `retries` attempts. A file that exhausts its retries is
    * recorded as `error` and does not abort the rest of the batch (the
    * reference logs and continues; failed files surface in the log for
    * the next cycle, which re-uploads them because they never reached
    * the destination).
    */
  def uploadByDate(
      spark: SparkSession, dateDir: String, destRoot: String,
      retries: Int = 3, retrySleepMs: Long = 0L): Seq[UploadRecord] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(dateDir)
    val sfs = src.getFileSystem(conf)
    val date = src.getName
    val dst = new Path(destRoot, date)
    val dfs = dst.getFileSystem(conf)
    dfs.mkdirs(dst)
    // sweep orphaned partial transfers from a crashed prior run: a crash
    // between copy and rename leaves <name>.inprogress at the destination,
    // which no retry ever targets again (attempts always copy to a fresh
    // temp) — without this, partial-transfer garbage accumulates and can be
    // swept up by downstream wildcard listings/loads
    dfs.listStatus(dst)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".inprogress"))
      .foreach(st => dfs.delete(st.getPath, false))
    val csvs = sfs.listStatus(src)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".csv"))
      .sortBy(_.getPath.getName)
    val recs = csvs.map { st =>
      val out = new Path(dst, st.getPath.getName)
      if (dfs.exists(out))
        UploadRecord(st.getPath.toString, out.toString, st.getLen, 0L,
          "skip", "exists at destination")
      else {
        var attempt = 0
        var err: Option[Throwable] = None
        var ok = false
        while (!ok && attempt < retries) {
          attempt += 1
          try {
            beforeCopyHook(st.getPath.toString, out.toString)
            val tmp = new Path(dst, out.getName + ".inprogress")
            FileUtil.copy(sfs, st.getPath, dfs, tmp,
              /* deleteSource = */ false, /* overwrite = */ true, conf)
            if (!dfs.rename(tmp, out))
              throw new java.io.IOException(s"rename $tmp -> $out failed")
            ok = true
          } catch {
            case scala.util.control.NonFatal(e) =>
              err = Some(e)
              if (attempt < retries && retrySleepMs > 0)
                Thread.sleep(retrySleepMs)
          }
        }
        if (ok)
          UploadRecord(st.getPath.toString, out.toString, st.getLen,
            st.getLen, "OK", s"attempt $attempt")
        else
          UploadRecord(st.getPath.toString, out.toString, st.getLen, 0L,
            "error", sanitize(err.map(_.toString).getOrElse("unknown")))
      }
    }.toSeq
    // the transfer log lives next to the SOURCE date dir (dump2csv.py:126)
    val os = sfs.create(infoPath(src), true)
    try {
      val header = "Source,Destination,Source Size,Bytes Transferred," +
        "Result,Description\n"
      os.write(header.getBytes("UTF-8"))
      recs.foreach { r =>
        os.write((Seq(r.source, r.destination, r.sourceSize.toString,
          r.bytesTransferred.toString, r.result, sanitize(r.description))
          .mkString(",") + "\n").getBytes("UTF-8"))
      }
    } finally os.close()
    recs
  }

  /** One file's exactly-once load plan: warehouse coordinates parsed from
    * the uploaded file name (`db.table.<ts>.csv` → dataset `db`, table
    * `table` — dump2csv.py:236-240), the optional schema file looked up
    * under `<schemaRoot>/<db>/<table>` (dump2csv.py:241-246 — absent
    * schema degrades to an autodetect load, warned not fatal), and the
    * rendered load command for the caller's scheduler.
    */
  final case class LoadSpec(
      dataset: String, table: String, sourceUri: String,
      schemaPath: Option[String], command: String)

  /** K5 planning (dump2csv.py:216-235): the destinations recorded in
    * `upload.info` minus the lines already acked in `bqload.info` — the
    * set-difference idempotence (E2) that makes replaying a load cycle
    * safe. Returns one [[LoadSpec]] per still-pending destination, in
    * log order. Files whose upload FAILED are excluded (they never
    * reached the destination; the next upload cycle retries them).
    */
  def pendingLoads(
      spark: SparkSession, dateDir: String,
      schemaRoot: Option[String] = None): Seq[LoadSpec] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(dateDir)
    val sfs = src.getFileSystem(conf)
    val ups = readLines(sfs, infoPath(src)).drop(1) // header
      .map(_.split(",", -1))
      .filter(f => f.length >= 5 && f(4) != "error")
      .map(f => f(1))
    val loaded = readLines(sfs, loadLogPath(src)).map(_.trim).toSet
    ups.filterNot(loaded).flatMap { uri =>
      val file = uri.substring(uri.lastIndexOf('/') + 1)
      val parts = file.split("\\.")
      // uploadByDate transfers EVERY *.csv; only db.table.<ts>.csv names
      // carry warehouse coordinates. A stray file (e.g. report.csv) must
      // not abort the whole load plan — log and continue, as the
      // reference does for its own malformed cases (dump2csv.py:241-246)
      if (parts.length < 4) {
        System.err.println(
          s"[upload] skipping malformed upload name (want db.table.<ts>.csv): $file")
        None
      } else pendingLoadOf(parts, uri, schemaRoot, conf)
    }
  }

  private def pendingLoadOf(
      parts: Array[String], uri: String, schemaRoot: Option[String],
      conf: org.apache.hadoop.conf.Configuration): Option[LoadSpec] = {
    val (db, tb) = (parts(0), parts(1))
      val schema = schemaRoot.flatMap { root =>
        val p = new Path(new Path(root, db), tb)
        if (p.getFileSystem(conf).exists(p)) Some(p.toString) else None
      }
    val cmd = schema match {
      case Some(s) =>
        s"bq load --schema=$s --skip_leading_rows=1 " +
          s"--allow_quoted_newlines $db.$tb $uri"
      case None =>
        s"bq load --skip_leading_rows=1 --allow_quoted_newlines " +
          s"$db.$tb $uri"
    }
    Some(LoadSpec(db, tb, uri, schema, cmd))
  }

  /** Ack one completed load (dump2csv.py:256-258: append the destination
    * to `bqload.info`). Implemented as read-modify-write because plain
    * `FileSystem.append` is unsupported on several stores (local
    * checksummed FS included); the log is one short line per file per
    * date, so the rewrite is trivially small.
    *
    * The rewrite goes through a temp file renamed into place (the same
    * rename-into-place discipline [[uploadByDate]] uses): a direct
    * `create(overwrite)` would truncate the log first, so a crash between
    * truncate and close loses EVERY prior ack and the next cycle re-loads
    * every file — worse than the reference's append, which at most loses
    * the last ack. With rename, the log is never observable in a
    * truncated state.
    */
  def markLoaded(spark: SparkSession, dateDir: String, uri: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new Path(dateDir)
    val sfs = src.getFileSystem(conf)
    val log = loadLogPath(src)
    val lines = readLines(sfs, log) :+ uri
    val tmp = new Path(src, log.getName + ".tmp")
    val os = sfs.create(tmp, true)
    try os.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally os.close()
    // FileContext.rename(OVERWRITE) is the atomic replace the FileSystem
    // API lacks (FileSystem.rename refuses an existing destination on
    // several stores)
    org.apache.hadoop.fs.FileContext.getFileContext(log.toUri, conf)
      .rename(tmp, log, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readLines(
      fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[String] =
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList.filter(_.nonEmpty)
      finally in.close()
    }
}
