package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path

/** Concurrency stress for the `_LOCK` mutex WITH the r17 reclaim
  * protocol in play. The choreographed LakeGuardSpec cases pin each
  * reclaim rule in isolation; this spec hammers the mutual-exclusion
  * invariant itself — at no instant may two threads be inside a guarded
  * body for one root — while a chaos thread keeps planting RECLAIMABLE
  * stale locks (full identity, same host, provably dead pid) into every
  * gap it can find. Pre-r17 the reclaim's bare delete+create TOCTOU
  * could admit two contenders that both observed the same dead writer;
  * the claim-file serialization must hold under real interleaving, not
  * just the staged two-party race.
  *
  * Contention (`locked by another writer`) and claim-blocked
  * (`_LOCK.claim exists`) failures are the EXPECTED back-off signals
  * under this load and are retried; any other throw fails the test.
  */
class LockStressSpec extends SparkSuite {

  test("mutual exclusion holds under contention with reclaimable stale " +
      "locks injected: never two holders, every stale lock cleared") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lockstress").toString
    val root = s"$work/lake"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root))
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val entries = new java.util.concurrent.atomic.AtomicInteger(0)
    val reclaims = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val unexpected =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val workers = (1 to 6).map { _ =>
      new Thread(() => {
        val rnd = new java.util.Random()
        while (!stop.get()) {
          try {
            Lake.guarded(spark, root) {
              if (inBody.incrementAndGet() != 1) violations.incrementAndGet()
              Thread.sleep(rnd.nextInt(3).toLong)
              inBody.decrementAndGet()
              entries.incrementAndGet()
            }
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("locked by another writer") ||
                  e.getMessage.contains("_LOCK.claim") => () // back off
            case t: Throwable => unexpected.compareAndSet(null, t); stop.set(true)
          }
          Thread.sleep(rnd.nextInt(2).toLong)
        }
      })
    }
    // chaos: whenever the lock is free, plant a stale-but-reclaimable
    // lock (dead pid, this host, full identity). MUST use the same
    // O_EXCL NIO create the product's file: branch uses — Hadoop's
    // RawLocalFileSystem create(overwrite=false) is exists-then-open,
    // which could TRUNCATE a worker's freshly-won live lock and make
    // the test itself manufacture a false mutual-exclusion violation.
    val host = java.net.InetAddress.getLocalHost.getHostName
    // machine identity exactly as the product records it: boot id +
    // pid namespace when /proc exposes them (then the plant is
    // reclaimable on ANY hostname — a CI box named `localhost` would
    // otherwise wedge the test, since the hostname fallback rightly
    // refuses generic names; r18 review-3 #6), hostname-only otherwise
    // (then this host's name must be able to prove machine identity)
    def procLine(path: String, key: String): Option[String] = {
      val p = java.nio.file.Paths.get(path)
      try {
        if (key == "boot")
          Some(s"$key=${java.nio.file.Files.readString(p).trim}")
        else Some(s"$key=${java.nio.file.Files.readSymbolicLink(p)}")
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    val machineLines = Seq(
      procLine("/proc/sys/kernel/random/boot_id", "boot"),
      procLine("/proc/self/ns/pid", "pidns")).flatten
    if (machineLines.isEmpty) assume(
      !Set("localhost", "localhost.localdomain", "unknown-host", "")(
        host.toLowerCase),
      s"no /proc machine identity and hostname '$host' is generic — " +
        "the planted legacy lock would be reclaimable by no rule")
    val lockNio = java.nio.file.Paths.get(s"$root/_LOCK")
    val chaos = new Thread(() => {
      while (!stop.get()) {
        try {
          java.nio.file.Files.write(lockNio,
            (s"pid=2999999999\nstart=123\nhost=$host\n" +
              machineLines.map(_ + "\n").mkString +
              "app=app-dead\n").getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW): Unit
          reclaims.incrementAndGet()
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => () // held
          case _: java.io.IOException => ()
        }
        Thread.sleep(3L)
      }
    })
    try {
      (workers :+ chaos).foreach(_.start())
      Thread.sleep(4000L)
      stop.set(true)
      (workers :+ chaos).foreach(_.join(20000L))
      if (unexpected.get() != null) throw unexpected.get()
      assert(violations.get() === 0,
        s"mutual exclusion violated ${violations.get()} times")
      // the system made real progress THROUGH the injected stale locks:
      // entries happened, stale locks were planted, and the final state
      // is clean (the last plant, if unreclaimed at stop, is the one
      // allowed residue — a mid-stress plant with no contender left)
      assert(entries.get() > 50, s"only ${entries.get()} entries — no load")
      assert(reclaims.get() > 0, "chaos never planted a stale lock")
      assert(!fs.exists(new Path(root, "_LOCK.claim")),
        "a reclaim claim leaked")
    } finally {
      stop.set(true)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
  }

  test("mutual exclusion holds when the chaos plants LEASE-EXPIRED " +
      "locks: the staleBeat rule + claim-serialized mtime re-check " +
      "admit exactly one contender per reclaim under real interleaving") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lockstress_lease").toString
    val root = s"$work/lake"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root))
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val entries = new java.util.concurrent.atomic.AtomicInteger(0)
    val planted = new java.util.concurrent.atomic.AtomicInteger(0)
    val violations = new java.util.concurrent.atomic.AtomicInteger(0)
    val unexpected =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val workers = (1 to 6).map { _ =>
      new Thread(() => {
        val rnd = new java.util.Random()
        while (!stop.get()) {
          try {
            Lake.guarded(spark, root) {
              if (inBody.incrementAndGet() != 1) violations.incrementAndGet()
              Thread.sleep(rnd.nextInt(3).toLong)
              inBody.decrementAndGet()
              entries.incrementAndGet()
            }
          } catch {
            case e: IllegalStateException
                if e.getMessage.contains("locked by another writer") ||
                  e.getMessage.contains("_LOCK.claim") => () // back off
            case t: Throwable => unexpected.compareAndSet(null, t); stop.set(true)
          }
          Thread.sleep(rnd.nextInt(2).toLong)
        }
      })
    }
    // chaos: plant FOREIGN-machine heartbeat locks whose lease is
    // already expired (beatms=50, mtime frozen 10 s in the past) — the
    // ONLY applicable reclaim rule is staleBeat, so every entry above
    // exercises the lease path and the under-claim mtime re-evaluation
    val lockNio = java.nio.file.Paths.get(s"$root/_LOCK")
    val chaos = new Thread(() => {
      while (!stop.get()) {
        try {
          java.nio.file.Files.write(lockNio,
            ("pid=4242\nstart=99\nhost=elsewhere\n" +
              "boot=00000000-dead-dead-dead-000000000000\n" +
              "pidns=pid:[1111111111]\napp=app-killed\n" +
              "beatms=50\n").getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW): Unit
          new java.io.File(s"$root/_LOCK")
            .setLastModified(System.currentTimeMillis() - 10000L): Unit
          planted.incrementAndGet()
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => () // held
          case _: java.io.IOException => ()
        }
        Thread.sleep(3L)
      }
    })
    try {
      (workers :+ chaos).foreach(_.start())
      Thread.sleep(4000L)
      stop.set(true)
      (workers :+ chaos).foreach(_.join(20000L))
      if (unexpected.get() != null) throw unexpected.get()
      assert(violations.get() === 0,
        s"mutual exclusion violated ${violations.get()} times")
      assert(entries.get() > 50, s"only ${entries.get()} entries — no load")
      assert(planted.get() > 0, "chaos never planted an expired lease")
      assert(!fs.exists(new Path(root, "_LOCK.claim")),
        "a reclaim claim leaked")
    } finally {
      stop.set(true)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
  }

  test("lease reclaim (r17 verdict #1): a killed heartbeat-holder's lock " +
      "— remote host, no pid evidence, mtime frozen past 6x its own " +
      "beatms promise — is reclaimed without manual removal") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lease_dead").toString
    val root = s"$work/lake"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      fs.mkdirs(new Path(root))
      // the exact state a kill -9 leaves: full identity advertising a
      // 100 ms heartbeat, written by ANOTHER machine (different boot id,
      // foreign host — neither pid rule nor token can apply), beats
      // stopped so the mtime freezes at plant time
      val os = fs.create(new Path(root, "_LOCK"), false)
      os.write(("pid=4242\nstart=99\nhost=elsewhere\n" +
        "boot=00000000-dead-dead-dead-000000000000\napp=app-killed\n" +
        "beatms=100\n").getBytes("UTF-8")); os.close()
      // not yet stale: a contender inside the 600 ms lease must back off
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered inside a live lease") }
      }
      Thread.sleep(1000L) // > 6 x 100 ms promise
      Lake.guarded(spark, root) { () } // reclaims, enters, releases
      assert(!fs.exists(new Path(root, "_LOCK")))
      assert(!fs.exists(new Path(root, "_LOCK.claim")))
      // control: the SAME stale state WITHOUT a beatms promise is the
      // legacy no-TTL contract — never auto-expired, manual only
      val os2 = fs.create(new Path(root, "_LOCK"), false)
      os2.write(("pid=4242\nstart=99\nhost=elsewhere\n" +
        "boot=00000000-dead-dead-dead-000000000000\n" +
        "app=app-killed\n").getBytes("UTF-8")); os2.close()
      new java.io.File(s"$root/_LOCK")
        .setLastModified(System.currentTimeMillis() - 3600000L): Unit
      val e = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("TTL-reclaimed a no-lease lock") }
      }
      assert(e.getMessage.contains("delete _LOCK by hand"), e.getMessage)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(work))
  }

  test("lease liveness (r17 verdict #1): a LIVE slow holder heartbeating " +
      "every 100 ms is NOT reclaimed even when its body far outlives the " +
      "600 ms lease; the lock releases normally after") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lease_live").toString
    val root = s"$work/lake"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.conf.set(Lake.BeatConf, "100")
    try {
      val entered = new java.util.concurrent.CountDownLatch(1)
      val holderErr =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val holder = new Thread(() =>
        try Lake.guarded(spark, root) {
          entered.countDown()
          Thread.sleep(2000L) // 3.3x the lease, kept alive by beats
        } catch { case t: Throwable => holderErr.set(t) })
      holder.start()
      assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(900L) // well past 6 x 100 ms from CREATION mtime
      // the heartbeat genuinely refreshed the mtime (the same-JVM holder
      // would also be shielded by samePidAlive — assert the beat itself,
      // not just the contention outcome, so the REMOTE-holder case is
      // what this pins)
      val age = System.currentTimeMillis() -
        fs.getFileStatus(new Path(root, "_LOCK")).getModificationTime
      assert(age < 600L, s"heartbeat never refreshed the lock (age $age ms)")
      val e = intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("reclaimed a live lease") }
      }
      assert(e.getMessage.contains("locked by another writer"), e.getMessage)
      holder.join(20000L)
      assert(holderErr.get() == null, s"holder failed: ${holderErr.get()}")
      // released cleanly; the next writer enters with no residue
      assert(!fs.exists(new Path(root, "_LOCK")))
      Lake.guarded(spark, root) { () }
    } finally {
      try spark.conf.unset(Lake.BeatConf)
      catch { case scala.util.control.NonFatal(_) => () }
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(work))
    }
  }

  test("release-ownership check: a holder whose lock was usurped " +
      "mid-body leaves the new holder's _LOCK in place at release " +
      "instead of unlocking a third writer into it") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_lease_usurp").toString
    val root = s"$work/lake"
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val lock = new Path(root, "_LOCK")
      Lake.guarded(spark, root) {
        // simulate a lease takeover: replace our lock with the
        // usurper's identity while we are still inside the body
        fs.delete(lock, false)
        val os = fs.create(lock, false)
        os.write(("pid=7777\nstart=7\nhost=usurper\n" +
          "app=app-new\nbeatms=15000\n").getBytes("UTF-8")); os.close()
      }
      // release must NOT have deleted the usurper's lock
      assert(fs.exists(lock), "release deleted a lock it no longer owned")
      val id = new String(org.apache.commons.io.IOUtils.toByteArray(
        fs.open(lock)), "UTF-8")
      assert(id.contains("host=usurper"), id)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(work))
  }
}
