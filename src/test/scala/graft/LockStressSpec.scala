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
    val lockNio = java.nio.file.Paths.get(s"$root/_LOCK")
    val chaos = new Thread(() => {
      while (!stop.get()) {
        try {
          java.nio.file.Files.write(lockNio,
            (s"pid=2999999999\nstart=123\nhost=$host\n" +
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
}
