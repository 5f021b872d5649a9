package graft

import graft.sources.Upload
import org.scalatest.funsuite.AnyFunSuite

/** K4/K5 parity: date-grouped upload with skip-existing + transfer log +
  * bounded retries, and the exactly-once load plan tracked by
  * set-difference against the ack log (dump2csv.py:119-138, 216-267).
  */
class UploadSpec extends AnyFunSuite with SparkSuite {

  private def mkDump(dir: String, date: String,
      files: Map[String, String]): String = {
    val d = new java.io.File(s"$dir/$date")
    d.mkdirs()
    files.foreach { case (name, content) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$date/$name"), content)
    }
    d.toString
  }

  test("upload: copies, skips existing on re-run, logs upload.info") {
    val root = java.nio.file.Files.createTempDirectory("graft_up").toString
    val dateDir = mkDump(s"$root/dump", "20160608", Map(
      "db_test.events.1465372800.csv" -> "cdc_action,cdc_ts\ninsert,1\n",
      "db_test.orders.1465372801.csv" -> "cdc_action,cdc_ts\nupdate,2\n",
      "notes.txt" -> "not a csv — must be ignored"))
    val dest = s"$root/bucket"
    try {
      val r1 = Upload.uploadByDate(spark, dateDir, dest)
      assert(r1.map(_.result) === Seq("OK", "OK")) // txt ignored
      // raw listing sees Hadoop's hidden .crc sidecars — filter them
      val up1 = new java.io.File(s"$dest/20160608")
      def visible(d: java.io.File) =
        d.listFiles().map(_.getName).filterNot(_.startsWith("."))
      assert(visible(up1).sorted.toSeq ===
        Seq("db_test.events.1465372800.csv", "db_test.orders.1465372801.csv"))
      assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
        s"$dest/20160608/db_test.events.1465372800.csv"))
        .contains("insert,1"))
      // transfer log: header + one row per csv, result column OK
      val info = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dateDir/upload.info"))
      assert(info.get(0).startsWith("Source,Destination"))
      assert(info.size === 3)
      // second run: -n semantics — everything skips, bytes untouched
      val mtimes = up1.listFiles().filterNot(_.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
      val r2 = Upload.uploadByDate(spark, dateDir, dest)
      assert(r2.map(_.result) === Seq("skip", "skip"))
      assert(up1.listFiles().filterNot(_.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
        === mtimes, "skip run touched destination files")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("upload: bounded retries recover transient failures; a file that " +
      "exhausts retries is error-logged without aborting the batch") {
    val root = java.nio.file.Files.createTempDirectory("graft_upr").toString
    val dateDir = mkDump(s"$root/dump", "20160609", Map(
      "db_test.a.1.csv" -> "h\n1\n",
      "db_test.b.2.csv" -> "h\n2\n"))
    val dest = s"$root/bucket"
    val fails = scala.collection.mutable.Map[String, Int]()
    try {
      // a: fails twice then succeeds (within 3 tries); b: always fails
      Upload.beforeCopyHook = (src, _) => {
        val n = fails.getOrElse(src, 0); fails(src) = n + 1
        if (src.endsWith("db_test.a.1.csv") && n < 2)
          throw new java.io.IOException(s"injected transient #$n")
        if (src.endsWith("db_test.b.2.csv"))
          throw new java.io.IOException("injected permanent")
      }
      val r = Upload.uploadByDate(spark, dateDir, dest)
      val byName = r.map(x => x.source.split('/').last -> x).toMap
      assert(byName("db_test.a.1.csv").result === "OK")
      assert(byName("db_test.a.1.csv").description === "attempt 3")
      assert(byName("db_test.b.2.csv").result === "error")
      assert(byName("db_test.b.2.csv").description.contains("injected"))
      // the failed file never reached the destination (no partial file,
      // no .inprogress remnant counted as done) — next cycle re-uploads
      val names = new java.io.File(s"$dest/20160609").listFiles()
        .map(_.getName).filterNot(_.startsWith(".")).toSet
      assert(names === Set("db_test.a.1.csv"))
      Upload.beforeCopyHook = (_, _) => ()
      val r2 = Upload.uploadByDate(spark, dateDir, dest)
      val byName2 = r2.map(x => x.source.split('/').last -> x).toMap
      assert(byName2("db_test.a.1.csv").result === "skip")
      assert(byName2("db_test.b.2.csv").result === "OK")
    } finally {
      Upload.beforeCopyHook = (_, _) => ()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("load plan: exactly-once via set-difference against the ack log, " +
      "schema lookup, failed uploads excluded") {
    val root = java.nio.file.Files.createTempDirectory("graft_upl").toString
    val dateDir = mkDump(s"$root/dump", "20160610", Map(
      "db_test.events.10.csv" -> "h\n1\n",
      "db_test.task_test.11.csv" -> "h\n2\n",
      "db_other.t.12.csv" -> "h\n3\n"))
    val dest = s"$root/bucket"
    // schema present for db_test.events only
    new java.io.File(s"$root/bq_schema/db_test").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      s"$root/bq_schema/db_test/events"), """[{"name":"h","type":"STRING"}]""")
    try {
      // make db_other.t fail its upload — it must not appear in the plan
      Upload.beforeCopyHook = (src, _) =>
        if (src.endsWith("db_other.t.12.csv"))
          throw new java.io.IOException("injected")
      Upload.uploadByDate(spark, dateDir, dest)
      Upload.beforeCopyHook = (_, _) => ()
      val plan1 = Upload.pendingLoads(spark, dateDir,
        schemaRoot = Some(s"$root/bq_schema"))
      assert(plan1.map(p => (p.dataset, p.table)) ===
        Seq(("db_test", "events"), ("db_test", "task_test")))
      val ev = plan1.head
      assert(ev.schemaPath.exists(_.endsWith("db_test/events")))
      assert(ev.command.contains("--schema=") &&
        ev.command.contains("db_test.events"))
      assert(plan1(1).schemaPath.isEmpty) // degrade to autodetect load
      assert(!plan1(1).command.contains("--schema"))
      // ack one load: it leaves the plan; ack the rest: plan drains;
      // replaying the whole cycle stays empty (exactly-once)
      Upload.markLoaded(spark, dateDir, ev.sourceUri)
      val plan2 = Upload.pendingLoads(spark, dateDir,
        schemaRoot = Some(s"$root/bq_schema"))
      assert(plan2.map(_.table) === Seq("task_test"))
      plan2.foreach(p => Upload.markLoaded(spark, dateDir, p.sourceUri))
      assert(Upload.pendingLoads(spark, dateDir).isEmpty)
      // the failed file uploads on the next cycle and ONLY then enters
      // the plan — upload/load stay consistent without coordination
      Upload.uploadByDate(spark, dateDir, dest)
      val plan3 = Upload.pendingLoads(spark, dateDir)
      assert(plan3.map(p => (p.dataset, p.table)) === Seq(("db_other", "t")))
    } finally {
      Upload.beforeCopyHook = (_, _) => ()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("load execution: the rendered command runs against a stub warehouse " +
      "CLI; crash-replay re-submits only unacked loads; failed loads stay " +
      "in the plan") {
    val root = java.nio.file.Files.createTempDirectory("graft_upx").toString
    val dateDir = mkDump(s"$root/dump", "20160612", Map(
      "db_test.events.20.csv" -> "h\n1\n",
      "db_test.orders.21.csv" -> "h\n2\n"))
    val dest = s"$root/bucket"
    // a stub `bq` on PATH: appends its argv to a ledger, exit code from a
    // flag file — the external seam the reference crosses via subprocess
    // (dump2csv.py:247-255) exercised end-to-end without a live warehouse
    val bin = new java.io.File(s"$root/bin"); bin.mkdirs()
    val ledger = s"$root/ledger.txt"
    val exitFile = s"$root/exitcode"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(exitFile), "0")
    val stub = java.nio.file.Paths.get(s"$bin/bq")
    java.nio.file.Files.writeString(stub,
      s"#!/bin/sh\necho \"$$@\" >> $ledger\nexit $$(cat $exitFile)\n")
    stub.toFile.setExecutable(true)
    def runLoad(cmd: String): Int = {
      import scala.sys.process._
      Process(Seq("/bin/sh", "-c", cmd), None,
        "PATH" -> s"$bin:${sys.env("PATH")}").!
    }
    def ledgerLines() =
      if (new java.io.File(ledger).exists())
        java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(ledger)).toArray.toSeq.map(_.toString)
      else Seq.empty[String]
    try {
      Upload.uploadByDate(spark, dateDir, dest)
      // cycle 1: load events, ack it; load orders, then CRASH before the
      // ack (the widest window — the warehouse committed, our log didn't)
      val plan1 = Upload.pendingLoads(spark, dateDir)
      assert(plan1.map(_.table) === Seq("events", "orders"))
      assert(runLoad(plan1(0).command) === 0)
      Upload.markLoaded(spark, dateDir, plan1(0).sourceUri)
      assert(runLoad(plan1(1).command) === 0)
      // <crash here: no markLoaded for orders>
      assert(ledgerLines().size === 2)
      // cycle 2 (replay): the acked load is NOT re-submitted; the unacked
      // one is — at-least-once across the seam, exactly-once for acked work
      val plan2 = Upload.pendingLoads(spark, dateDir)
      assert(plan2.map(_.table) === Seq("orders"))
      assert(runLoad(plan2(0).command) === 0)
      Upload.markLoaded(spark, dateDir, plan2(0).sourceUri)
      val lines = ledgerLines()
      assert(lines.size === 3)
      assert(lines.count(_.contains("db_test.orders.21.csv")) === 2)
      assert(lines.count(_.contains("db_test.events.20.csv")) === 1)
      // every submission carried the full rendered argv
      assert(lines.forall(l => l.startsWith("load ") &&
        l.contains("--skip_leading_rows=1")))
      // cycle 3: everything acked — nothing to submit, ledger unchanged
      assert(Upload.pendingLoads(spark, dateDir).isEmpty)
      // a FAILED load (nonzero exit) must not be acked, so it stays in the
      // plan for the next cycle — scheduler contract: ack only on exit 0
      val extra = mkDump(s"$root/dump", "20160612",
        Map("db_test.late.22.csv" -> "h\n3\n"))
      assert(extra === dateDir)
      Upload.uploadByDate(spark, dateDir, dest)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(exitFile), "1")
      val plan3 = Upload.pendingLoads(spark, dateDir)
      assert(plan3.map(_.table) === Seq("late"))
      assert(runLoad(plan3(0).command) !== 0) // submit fails → no ack
      assert(Upload.pendingLoads(spark, dateDir).map(_.table) === Seq("late"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(exitFile), "0")
      assert(runLoad(plan3(0).command) === 0)
      Upload.markLoaded(spark, dateDir, plan3(0).sourceUri)
      assert(Upload.pendingLoads(spark, dateDir).isEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("hardening: malformed csv names skipped in the plan, stale " +
      ".inprogress orphans swept, ack log rewritten via rename") {
    val root = java.nio.file.Files.createTempDirectory("graft_uph").toString
    val dateDir = mkDump(s"$root/dump", "20160611", Map(
      "db_test.a.1.csv" -> "h\n1\n",
      "report.csv" -> "not warehouse-addressable\n")) // uploads, never loads
    val dest = s"$root/bucket"
    try {
      // a crashed prior run left a partial transfer at the destination
      val dstDate = new java.io.File(s"$dest/20160611")
      dstDate.mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        s"$dstDate/db_test.zz.9.csv.inprogress"), "partial garbage")
      val r = Upload.uploadByDate(spark, dateDir, dest)
      // both csvs upload (transport accepts any *.csv, like gsutil)
      assert(r.map(_.result) === Seq("OK", "OK"))
      val names = dstDate.listFiles().map(_.getName)
        .filterNot(_.startsWith(".")).toSet
      assert(!names.exists(_.endsWith(".inprogress")),
        "stale .inprogress orphan survived the sweep")
      // the plan carries only warehouse-addressable names; report.csv is
      // logged-and-skipped, not an ArrayIndexOutOfBounds abort
      val plan = Upload.pendingLoads(spark, dateDir)
      assert(plan.map(p => (p.dataset, p.table)) === Seq(("db_test", "a")))
      // acks go through a temp+rename: no .tmp remnant, log intact
      Upload.markLoaded(spark, dateDir, plan.head.sourceUri)
      assert(Upload.pendingLoads(spark, dateDir).isEmpty)
      assert(!new java.io.File(dateDir).listFiles()
        .map(_.getName).exists(_.contains("bqload.info.tmp")),
        "markLoaded left its temp file behind")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
