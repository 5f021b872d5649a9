package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Writer-guard and schema-policy contracts: the single-writer contract
  * is enforced (exclusive `_LOCK`, loud second-writer failure, no TTL
  * takeover, thread reentrancy), and a publish that changes a column's
  * type or drops a column fails NAMING the column before any data lands.
  */
class LakeGuardSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(tag: String) =
    (0 until 10).map(j => (j.toLong, "g0", s"$tag $j")).toDF("id", "k", "text")

  private def tmp() = java.nio.file.Files
    .createTempDirectory("graft_lakeguard").toString + "/lake"

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("guarded: exclusive, loud on contention, reentrant, released; a " +
      "stale lock fails with the remediation text, never auto-expires") {
    val root = tmp()
    try {
      // reentrancy: a guarded body can run guarded lake ops
      Lake.guarded(spark, root) {
        Lake.guarded(spark, root) {
          Lake.publishVersion(corpus("base"), root, Seq("k"), Seq("id"), 1000L)
        }
        // a CONCURRENT writer (different thread = no reentrancy) fails
        val other = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val t = new Thread(() =>
          try Lake.guarded(spark, root) { fail("second writer entered") }
          catch { case e: Throwable => other.set(e) })
        t.start(); t.join()
        assert(other.get().isInstanceOf[IllegalStateException])
        assert(other.get().getMessage.contains("locked by another writer"))
      }
      // released: the lock is gone and a new writer proceeds
      assert(!fsOf(root).exists(new Path(root, "_LOCK")))
      Lake.guarded(spark, root) {
        Lake.rollbackTo(spark, root, 0L)
      }
      // a stale lock (crashed writer) fails loudly with remediation —
      // and is NOT auto-removed
      val os = fsOf(root).create(new Path(root, "_LOCK"), false)
      os.write("999999\n".getBytes("UTF-8")); os.close()
      val e = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a stale lock") }
      }
      assert(e.getMessage.contains("delete _LOCK by hand"), e.getMessage)
      assert(fsOf(root).exists(new Path(root, "_LOCK")))
      fsOf(root).delete(new Path(root, "_LOCK"), false)
      Lake.guarded(spark, root) { () } // usable again after manual unlock
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("enforced single-writer (r15 verdict #3): every mutating entry " +
      "point takes the lock ITSELF — vacuum/rollback/publish/merge beside " +
      "a live publisher fail loudly with NO caller-side wrapping") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base"), root, Seq("k"), Seq("id"), 1000L)
      // simulate a live publisher mid-publish: the guard held on another
      // thread (reentrancy is per-thread, so this thread's direct calls
      // below contend like a second process would)
      val gate = new java.util.concurrent.SynchronousQueue[Unit]()
      val publisher = new Thread(() => Lake.guarded(spark, root) {
        gate.put(()); gate.take() // hold the lock until released
      })
      publisher.start(); gate.take()
      try {
        def contends(body: => Any): Unit = {
          val e = intercept[IllegalStateException](body)
          assert(e.getMessage.contains("locked by another writer"),
            e.getMessage)
        }
        contends(Lake.vacuum(spark, root, keep = 1).collect())
        contends(Lake.rollbackTo(spark, root, 0L))
        contends(Lake.publishVersion(
          corpus("v1"), root, Seq("k"), Seq("id"), 1000L))
        contends(Lake.publishDelta(
          corpus("v1"), root, Seq("k"), Seq("id"), 1000L))
        contends(Lake.mergeDelta(
          corpus("v1").withColumn("op", lit("upsert")),
          root, Seq("id"), Seq("k"), Seq("id"), 1000L))
      } finally { gate.put(()); publisher.join() }
      // contention never wrote anything: the lake is still at v=0 and
      // the released lock admits the next writer normally
      assert(Lake.currentVersion(spark, root).contains(0L))
      Lake.publishVersion(corpus("v1"), root, Seq("k"), Seq("id"), 1000L)
      assert(Lake.currentVersion(spark, root).contains(1L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("provable-death reclaim (r16 advice): a full-identity lock from a " +
      "dead same-host pid is reclaimed; owner-token restarts reclaim " +
      "their own lock; everything else stays manual") {
    val root = tmp()
    val fs = fsOf(root)
    def plant(lines: String*): Unit = {
      val os = fs.create(new Path(root, "_LOCK"), false)
      os.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); os.close()
    }
    val self = java.lang.ProcessHandle.current()
    val selfStart = self.info().startInstant()
      .map[Long](_.toEpochMilli).orElse(-1L)
    val host = java.net.InetAddress.getLocalHost.getHostName
    try {
      fs.mkdirs(new Path(root))
      // 1) same host, pid provably dead (no such process) → reclaimed
      plant("pid=2999999999", "start=123", s"host=$host", "app=app-old")
      Lake.guarded(spark, root) { () } // enters; would throw pre-r17
      assert(!fs.exists(new Path(root, "_LOCK"))) // released after body
      // 2) same host, pid ALIVE (ours, matching start) → contended, even
      // with a matching owner token: that is a live sibling thread
      spark.conf.set(Lake.OwnerConf, "ckpt-q1")
      plant(s"pid=${self.pid()}", s"start=$selfStart", s"host=$host",
        "app=app-live", "owner=ckpt-q1")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a live lock") }
      }
      fs.delete(new Path(root, "_LOCK"), false)
      // 3) owner token match, writer on ANOTHER host (liveness not
      // locally provable) → the token IS the proof of self-restart
      plant("pid=4242", "start=99", "host=elsewhere", "app=app-old",
        "owner=ckpt-q1")
      Lake.guarded(spark, root) { () }
      // 4) token mismatch + other host → manual, never auto-expired
      plant("pid=4242", "start=99", "host=elsewhere", "app=app-old",
        "owner=ckpt-OTHER")
      val e = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a foreign lock") }
      }
      assert(e.getMessage.contains("delete _LOCK by hand"))
      fs.delete(new Path(root, "_LOCK"), false)
      spark.conf.unset(Lake.OwnerConf)
      // 5) no token on our side: the other-host lock stays manual even
      // with its pid dead (cross-host liveness is not provable)
      plant("pid=2999999999", "start=123", "host=elsewhere", "app=app-old")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a remote lock") }
      }
      fs.delete(new Path(root, "_LOCK"), false)
      // 6) pid reuse: a LIVE pid (ours) whose recorded start instant
      // differs is a dead writer → reclaimed
      plant(s"pid=${self.pid()}", "start=1", s"host=$host", "app=app-old")
      Lake.guarded(spark, root) { () }
      // 7) reclaims serialize through _LOCK.claim: with a claim already
      // present (an in-flight or crash-orphaned reclaim), a reclaimable
      // lock is NOT touched — loud failure naming the claim; clearing
      // the claim lets the reclaim proceed, and the claim is cleaned up
      plant("pid=2999999999", "start=123", s"host=$host", "app=app-old")
      val cl = fs.create(new Path(root, "_LOCK.claim"), false)
      cl.write("pid=1\n".getBytes("UTF-8")); cl.close()
      val e3 = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("reclaimed under a live claim") }
      }
      assert(e3.getMessage.contains("_LOCK.claim"), e3.getMessage)
      assert(fs.exists(new Path(root, "_LOCK"))) // untouched
      fs.delete(new Path(root, "_LOCK.claim"), false)
      Lake.guarded(spark, root) { () }
      assert(!fs.exists(new Path(root, "_LOCK.claim")))
      assert(!fs.exists(new Path(root, "_LOCK")))
    } finally {
      try spark.conf.unset(Lake.OwnerConf)
      catch { case scala.util.control.NonFatal(_) => () }
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }

  test("liveness override (r17 advice): a lock naming OUR machine (boot " +
      "id) and a pid that is ALIVE here is never reclaimed — not by a " +
      "matching owner token, not by a stale lease — while the same lock " +
      "with a DEAD pid still is") {
    val root = tmp()
    val fs = fsOf(root)
    def plant(lines: String*): Unit = {
      val os = fs.create(new Path(root, "_LOCK"), false)
      os.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); os.close()
      // freeze the mtime far past any lease so ONLY liveness can save it
      new java.io.File(s"$root/_LOCK")
        .setLastModified(System.currentTimeMillis() - 3600000L): Unit
    }
    val host = java.net.InetAddress.getLocalHost.getHostName
    val boot = java.nio.file.Files.readString(java.nio.file.Paths
      .get("/proc/sys/kernel/random/boot_id")).trim
    val ns = java.nio.file.Files.readSymbolicLink(
      java.nio.file.Paths.get("/proc/self/ns/pid")).toString
    try {
      fs.mkdirs(new Path(root))
      // pid 1 is alive on this machine and is NOT this JVM. Pre-r18 the
      // sameToken rule reclaimed this lock (a hung-but-live prior
      // incarnation, or a supervisor restart overlapping a stuck driver
      // — Spark does not fence checkpoint dirs across driver processes):
      // exactly the split-brain the r17 advice flagged.
      spark.conf.set(Lake.OwnerConf, "ckpt-hung")
      plant("pid=1", "start=-1", s"host=$host", s"boot=$boot",
        s"pidns=$ns", "app=app-hung", "beatms=100", "owner=ckpt-hung")
      val e = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("split-brained a live writer") }
      }
      assert(e.getMessage.contains("locked by another writer"), e.getMessage)
      assert(fs.exists(new Path(root, "_LOCK"))) // untouched
      fs.delete(new Path(root, "_LOCK"), false)
      // control: the IDENTICAL lock with a provably-dead pid reclaims
      // through the same token rule the override just blocked
      plant("pid=2999999999", "start=123", s"host=$host", s"boot=$boot",
        s"pidns=$ns", "app=app-dead", "beatms=100", "owner=ckpt-hung")
      Lake.guarded(spark, root) { () }
      assert(!fs.exists(new Path(root, "_LOCK")))
      // sibling container (same boot id, DIFFERENT pid namespace): its
      // pids are invisible here, so "no such pid" proves nothing — the
      // dead-pid rule must not fire (r18 review #1); with no token and
      // no lease this stays manual
      spark.conf.unset(Lake.OwnerConf)
      plant("pid=2999999999", "start=123", s"host=$host", s"boot=$boot",
        "pidns=pid:[1111111111]", "app=app-sibling")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("split-brained a sibling " +
          "container's writer") }
      }
      fs.delete(new Path(root, "_LOCK"), false)
    } finally {
      try spark.conf.unset(Lake.OwnerConf)
      catch { case scala.util.control.NonFatal(_) => () }
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }

  test("reboot reclaim (r18 review-3 #3): a lock from THIS machine's " +
      "previous boot (hostname matches, boot id differs, pid dead) " +
      "reclaims on file: — crash-plus-reboot self-heals without a " +
      "lease — while the same lock naming another host stays manual") {
    val root = tmp()
    val fs = fsOf(root)
    def plant(lines: String*): Unit = {
      val os = fs.create(new Path(root, "_LOCK"), false)
      os.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); os.close()
    }
    val host = java.net.InetAddress.getLocalHost.getHostName
    assume(!Set("localhost", "localhost.localdomain", "unknown-host", "")(
      host.toLowerCase), s"hostname '$host' is generic — the fallback " +
      "rule this test pins rightly refuses it")
    try {
      fs.mkdirs(new Path(root))
      // our host, a FOREIGN boot id (this machine pre-reboot), dead pid,
      // no lease: pre-fix the boot mismatch was read as 'different
      // machine' and blocked the hostname fallback — a routine
      // crash-plus-reboot then demanded manual _LOCK removal
      plant("pid=2999999999", "start=123", s"host=$host",
        "boot=00000000-dead-dead-dead-000000000000",
        "pidns=pid:[1111111111]", "app=app-prereboot")
      Lake.guarded(spark, root) { () }
      assert(!fs.exists(new Path(root, "_LOCK")))
      // control: the SAME pre-reboot-shaped lock naming another machine
      // is exactly the cloned-VM hazard — hostname mismatch keeps it
      // manual
      plant("pid=2999999999", "start=123", "host=elsewhere",
        "boot=00000000-dead-dead-dead-000000000000",
        "pidns=pid:[1111111111]", "app=app-clone")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a foreign lock") }
      }
      fs.delete(new Path(root, "_LOCK"), false)
      // control: a LIVE pid recorded under a foreign boot is still dead
      // here if its start instant differs (any pid hit across boots is
      // reuse) — OUR pid with a recorded start that cannot match reclaims
      plant(s"pid=${java.lang.ProcessHandle.current().pid()}", "start=123",
        s"host=$host", "boot=00000000-dead-dead-dead-000000000000",
        "pidns=pid:[1111111111]", "app=app-prereboot")
      Lake.guarded(spark, root) { () }
      assert(!fs.exists(new Path(root, "_LOCK")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }

  test("zombie heartbeat fencing (r18 review-3 #2): a holder whose lock " +
      "was usurped stops beating — the usurper's mtime is never " +
      "refreshed — and release leaves the usurper's lock in place") {
    val root = tmp()
    val fs = fsOf(root)
    spark.conf.set(Lake.BeatConf, "100")
    val lockNio = java.nio.file.Paths.get(s"$root/_LOCK")
    val release = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      Lake.guarded(spark, root) {
        entered.countDown()
        release.await(15, java.util.concurrent.TimeUnit.SECONDS): Unit
      })
    try {
      fs.mkdirs(new Path(root))
      holder.start()
      assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS))
      // usurp: replace the holder's lock with a foreign identity whose
      // mtime is frozen in the past (a lease takeover while the holder
      // was paused)
      val frozen = System.currentTimeMillis() - 5000000L
      java.nio.file.Files.delete(lockNio)
      java.nio.file.Files.write(lockNio,
        ("pid=4242\nstart=99\nhost=elsewhere\napp=app-usurper\n" +
          "beatms=60000\n").getBytes("UTF-8"))
      Thread.sleep(250L) // let any in-flight read-then-setTimes land
      new java.io.File(s"$root/_LOCK").setLastModified(frozen): Unit
      Thread.sleep(600L) // ≥5 further beat periods
      val mt = fs.getFileStatus(new Path(root, "_LOCK")).getModificationTime
      assert(math.abs(mt - frozen) < 2000L,
        s"zombie holder refreshed the usurper's lock (mtime $mt, frozen " +
          s"$frozen) — the lease self-heal is defeated for later holders")
      release.countDown()
      holder.join(15000L)
      // release saw a foreign identity: the usurper's lock is untouched
      val text = new String(java.nio.file.Files.readAllBytes(lockNio), "UTF-8")
      assert(text.contains("app=app-usurper"), "release deleted the " +
        "usurper's lock")
    } finally {
      release.countDown()
      holder.join(15000L)
      spark.conf.unset(Lake.BeatConf)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root).getParentFile)
    }
  }

  test("lease-aware unreadable release (r18 review-3 #1): a lock that " +
      "is persistently unreadable at release is LEFT when it carried a " +
      "heartbeat promise (a live usurper must not be split-brained; an " +
      "own orphan lease-expires) and deleted only in no-lease mode") {
    val lockName = "_LOCK"
    def run(beatMs: String): (String, org.apache.hadoop.fs.FileSystem) = {
      val root = tmp()
      val fs = fsOf(root)
      spark.conf.set(Lake.BeatConf, beatMs)
      try {
        fs.mkdirs(new Path(root))
        Lake.guarded(spark, root) {
          // corrupt the lock mid-body: an empty file parses to no
          // identity at all — release's retried reads all fail
          val p = java.nio.file.Paths.get(s"$root/$lockName")
          java.nio.file.Files.delete(p)
          java.nio.file.Files.createFile(p): Unit
        }
      } finally spark.conf.unset(Lake.BeatConf)
      (root, fs)
    }
    val (leaseRoot, leaseFs) = run("100")
    try assert(leaseFs.exists(new Path(leaseRoot, lockName)),
      "lease-mode release deleted an unverifiable lock — a live " +
        "usurper at this path would have been split-brained")
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(leaseRoot).getParentFile)
    val (bareRoot, bareFs) = run("0")
    try assert(!bareFs.exists(new Path(bareRoot, lockName)),
      "no-lease release left an unverifiable lock — with no lease to " +
        "expire it, the orphan would demand manual removal forever")
    finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(bareRoot).getParentFile)
  }

  test("streaming restart self-heals its crashed incarnation's lock: " +
      "publishStream stamps its checkpoint location as the root-scoped " +
      "owner token, so the restart reclaims a stale lock carrying the " +
      "same token (no hand-deleted _LOCK on the recovery path)") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lockstream").toString
    val root = s"$work/lake"; val ckpt = s"$work/ckpt"
    val fs = fsOf(root)
    try {
      // the crashed incarnation's lock: another host, unknown pid, but
      // the SAME checkpoint-derived owner token the restart will carry
      fs.mkdirs(new Path(root))
      val os = fs.create(new Path(root, "_LOCK"), false)
      os.write(("pid=4242\nstart=99\nhost=elsewhere\napp=app-dead\n" +
        s"owner=$ckpt\n").getBytes("UTF-8")); os.close()
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      mem.addData((1L, "g0", "hello"), (2L, "g0", "world"))
      val q = Lake.publishStream(mem.toDF().toDF("id", "k", "text"),
        root, ckpt, Seq("k"), Seq("id"), maxRecordsPerFile = 1000L,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination() // pre-fix: every batch died on "locked by..."
      assert(Lake.currentVersion(spark, root) === Some(0L))
      assert(Lake.readVersion(spark, root).count() === 2L)
      assert(!fs.exists(new Path(root, "_LOCK"))) // released after batch
      // a FOREIGN token in the stale lock stays manual: restart blocked
      val os2 = fs.create(new Path(root, "_LOCK"), false)
      os2.write(("pid=4242\nstart=99\nhost=elsewhere\napp=app-dead\n" +
        "owner=/someone/elses/ckpt\n").getBytes("UTF-8")); os2.close()
      mem.addData((3L, "g0", "again"))
      val q2 = Lake.publishStream(mem.toDF().toDF("id", "k", "text"),
        root, ckpt, Seq("k"), Seq("id"), maxRecordsPerFile = 1000L,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val err = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { q2.awaitTermination() }
      assert(err.getMessage.contains("locked by another writer"),
        err.getMessage)
      fs.delete(new Path(root, "_LOCK"), false)
    } finally {
      // unset the root-scoped token this test's streams registered
      spark.conf.getAll.keys.filter(_.startsWith(Lake.OwnerConf))
        .foreach(k => try spark.conf.unset(k)
          catch { case scala.util.control.NonFatal(_) => () })
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(work))
    }
  }

  test("schema policy: additive allows new columns and rejects type " +
      "changes and drops by name; enforce rejects additions; any skips") {
    val root = tmp()
    try {
      Lake.publishVersion(corpus("base"), root, Seq("k"), Seq("id"), 1000L)
      // additive: a new column publishes
      Lake.publishVersion(corpus("v1").withColumn("score", lit(0.5)),
        root, Seq("k"), Seq("id"), 1000L)
      // type change fails naming the column (score: double -> string)
      val e1 = intercept[IllegalArgumentException] {
        Lake.publishVersion(
          corpus("v2").withColumn("score", lit("high")),
          root, Seq("k"), Seq("id"), 1000L)
      }
      assert(e1.getMessage.contains("'score'") &&
        e1.getMessage.contains("changes type"), e1.getMessage)
      // dropped column fails naming it
      val e2 = intercept[IllegalArgumentException] {
        Lake.publishVersion(corpus("v2"), root, Seq("k"), Seq("id"), 1000L)
      }
      assert(e2.getMessage.contains("'score'"), e2.getMessage)
      // enforce rejects an addition
      val e3 = intercept[IllegalArgumentException] {
        Lake.publishVersion(
          corpus("v2").withColumn("score", lit(0.9))
            .withColumn("extra", lit(1L)),
          root, Seq("k"), Seq("id"), 1000L, schemaPolicy = "enforce")
      }
      assert(e3.getMessage.contains("'extra'"), e3.getMessage)
      // any: the caller owns compatibility — the drop publishes
      Lake.publishVersion(corpus("v3"), root, Seq("k"), Seq("id"), 1000L,
        schemaPolicy = "any")
      assert(Lake.readVersion(spark, root).columns.toSet ===
        Set("id", "k", "text"))
      // a typo'd policy fails loudly
      intercept[IllegalArgumentException] {
        Lake.publishVersion(corpus("v4"), root, Seq("k"), Seq("id"), 1000L,
          schemaPolicy = "strict")
      }
      // the delta path carries the same policy
      val e4 = intercept[IllegalArgumentException] {
        Lake.publishDelta(
          corpus("d").withColumn("text", lit(1L)),
          root, Seq("k"), Seq("id"), 1000L)
      }
      assert(e4.getMessage.contains("'text'"), e4.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }

  test("policy checks fall back to readVersion resolution for a " +
      "generation without a _SCHEMA file (pre-upgrade lakes)") {
    val root = tmp()
    try {
      Lake.publishVersion(
        corpus("base").withColumn("score", lit(0.5)),
        root, Seq("k"), Seq("id"), 1000L)
      // simulate a generation published before _SCHEMA existed
      val fs = fsOf(root)
      assert(fs.delete(new Path(root, "v=0/_SCHEMA"), false))
      // the fallback still catches the type change by name
      val e = intercept[IllegalArgumentException] {
        Lake.publishVersion(
          corpus("v1").withColumn("score", lit("high")),
          root, Seq("k"), Seq("id"), 1000L)
      }
      assert(e.getMessage.contains("'score'"), e.getMessage)
      // and a compatible publish proceeds, re-establishing _SCHEMA
      Lake.publishVersion(corpus("v1").withColumn("score", lit(0.7)),
        root, Seq("k"), Seq("id"), 1000L)
      assert(fs.exists(new Path(root, "v=1/_SCHEMA")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root).getParentFile)
  }
}
