package graft

import graft.sources.Lake
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** A local RawLocalFileSystem masquerading as `s3a://` — storage works,
  * but the SCHEME is one whose real connector lacks atomic
  * create/rename, so every guarded/swap entry must refuse loudly.
  */
class FakeS3AFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}

/** Local storage masquerading as `hdfs://` — passes the scheme gate, so
  * the lock takes the NON-file acquisition branch (Hadoop
  * `create(overwrite=false)`), which is otherwise unreachable in a
  * sandbox with no real HDFS. */
class FakeHdfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("hdfs:///")
}

/** r15 verdict #8: the "guarded refuses nothing on plain S3" caveat is
  * ENFORCED — GenSwap.begin and Lake.guarded (and therefore every
  * mutating lake op) fail at entry on the S3-family schemes with the
  * documented remediation, instead of silently degrading to a non-mutex
  * lock and non-atomic swaps discovered in production.
  */
class AtomicFsGuardSpec extends SparkSuite {
  import spark.implicits._

  private def withFakeS3a[A](body: String => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prior = conf.get("fs.s3a.impl")
    conf.set("fs.s3a.impl", classOf[FakeS3AFileSystem].getName)
    conf.set("fs.s3a.impl.disable.cache", "true")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_fakes3a").toString
    try body(s"s3a://$tmp/lake")
    finally {
      if (prior == null) conf.unset("fs.s3a.impl")
      else conf.set("fs.s3a.impl", prior)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("guarded, GenSwap.begin, and the mutating lake ops refuse an " +
      "s3a:// root loudly with the remediation text") {
    withFakeS3a { root =>
      def refuses(body: => Any): Unit = {
        val e = intercept[UnsupportedOperationException](body)
        assert(e.getMessage.contains("atomic create/rename") &&
          e.getMessage.contains("Iceberg/Delta"), e.getMessage)
      }
      refuses(Lake.guarded(spark, root) { fail("entered on s3a") })
      refuses(GenSwap.begin(spark, root))
      // the enforcement composes: every mutating op acquires guarded
      // itself, so a publish against the scheme dies at entry too
      refuses(Lake.publishVersion(
        Seq(("a", "g0", "t")).toDF("id", "k", "text"),
        root, Seq("k"), Seq("id"), 1000L))
      refuses(Lake.vacuum(spark, root, keep = 1))
      // the standing consumer's CURSOR rides the same temp+rename
      // machinery (r16 verdict #7): a cursor file on a non-atomic
      // scheme refuses at entry too — crash safety there is built on
      // rename atomicity the store does not have
      refuses(Lake.followChanges(spark, root.replace("/lake", ""),
        s"$root/cursor", "id", "text") { (_, _) =>
        fail("followed on s3a") })
    }
  }

  test("the NON-file lock branch (hdfs-style create(overwrite=false)): " +
      "acquire/contend/release work, dead-pid reclaim is file-only, and " +
      "the owner-token reclaim still applies") {
    val conf = spark.sparkContext.hadoopConfiguration
    val prior = conf.get("fs.hdfs.impl")
    conf.set("fs.hdfs.impl", classOf[FakeHdfsFileSystem].getName)
    conf.set("fs.hdfs.impl.disable.cache", "true")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_fakehdfs").toString
    val root = s"hdfs://$tmp/lake"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(conf)
    try {
      // plain acquire + release through the Hadoop create branch
      Lake.guarded(spark, root) {
        assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_LOCK")))
      }
      assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_LOCK")))
      def plant(lines: String*): Unit = {
        val os = fs.create(
          new org.apache.hadoop.fs.Path(root, "_LOCK"), false)
        os.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); os.close()
      }
      val host = java.net.InetAddress.getLocalHost.getHostName
      // a legacy lock (no boot id) naming this HOSTNAME is NOT dead-pid
      // reclaimable off the file: scheme — hostname equality proves
      // nothing about machine identity on a shared store (r17 advice)
      plant("pid=2999999999", "start=123", s"host=$host", "app=app-old")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered under a remote lock") }
      }
      fs.delete(new org.apache.hadoop.fs.Path(root, "_LOCK"), false)
      // ... but a BOOT-ID + PID-NAMESPACE match proves pid-table
      // visibility on any scheme: the same dead pid with our boot id
      // AND our pid namespace reclaims through the hdfs branch
      val boot = java.nio.file.Files.readString(java.nio.file.Paths
        .get("/proc/sys/kernel/random/boot_id")).trim
      val ns = java.nio.file.Files.readSymbolicLink(
        java.nio.file.Paths.get("/proc/self/ns/pid")).toString
      plant("pid=2999999999", "start=123", s"host=$host", s"boot=$boot",
        s"pidns=$ns", "app=app-old")
      Lake.guarded(spark, root) { () }
      // boot id WITHOUT a matching pid namespace proves only same
      // KERNEL — a sibling container shares the boot id but cannot see
      // this pid table, so "no such pid here" is not death evidence
      // (r18 review: the sibling-container split-brain)
      plant("pid=2999999999", "start=123", s"host=$host", s"boot=$boot",
        "pidns=pid:[1111111111]", "app=app-old")
      intercept[IllegalStateException] {
        Lake.guarded(spark, root) { fail("entered on sibling-container " +
          "pid evidence") }
      }
      fs.delete(new org.apache.hadoop.fs.Path(root, "_LOCK"), false)
      // lease expiry is scheme-independent too: a foreign killed
      // heartbeat-holder (beats frozen past 6x its promise) self-heals
      // here exactly as on file: (r17 verdict #1 — the crashed one-shot
      // batch publisher on HDFS that used to need an operator)
      plant("pid=4242", "start=99", "host=elsewhere",
        "boot=00000000-dead-dead-dead-000000000000", "app=app-killed",
        "beatms=100")
      fs.setTimes(new org.apache.hadoop.fs.Path(root, "_LOCK"),
        System.currentTimeMillis() - 10000L, -1)
      Lake.guarded(spark, root) {
        // and OUR lock through this branch advertises its own lease
        val in = fs.open(new org.apache.hadoop.fs.Path(root, "_LOCK"))
        val id = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
        assert(id.contains("beatms="), id)
      }
      // ... and the owner token is scheme-independent proof of self
      spark.conf.set(Lake.OwnerConf, "ckpt-hdfs")
      plant("pid=4242", "start=99", "host=elsewhere", "app=app-old",
        "owner=ckpt-hdfs")
      Lake.guarded(spark, root) { () }
      assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "_LOCK.claim")))
    } finally {
      try spark.conf.unset(Lake.OwnerConf)
      catch { case scala.util.control.NonFatal(_) => () }
      if (prior == null) conf.unset("fs.hdfs.impl")
      else conf.set("fs.hdfs.impl", prior)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("local and hdfs-style schemes still pass the scheme gate") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_atomok").toString + "/lake"
    try {
      Lake.guarded(spark, tmp) { () } // no throw
      GenSwap.begin(spark, tmp) // no throw; staging dirs unused
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp).getParentFile)
  }
}
