package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Per-JVM warehouse + Derby metastore scratch (r16 verdict #4): two
  * test JVMs sharing the repo CWD collided on spark-warehouse/
  * metastore_db (a driver running tests beside a bench, or a second
  * sbt test in the same dir) — LshIndexSpec/StreamSimSpec failed only
  * in that contaminated shape. ONE process-unique dir per JVM (a
  * per-suite dir would be litter: getOrCreate ignores every builder
  * config after the first session exists), removed best-effort on JVM
  * exit. */
object SparkSuite {
  lazy val scratch: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft_test_jvm")
    System.setProperty("derby.system.home", dir.toString)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
      catch { case scala.util.control.NonFatal(_) => () }))
    dir
  }
}

/** Shared local session for specs (one per JVM via getOrCreate). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val scratch = SparkSuite.scratch
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        scratch.resolve("spark-warehouse").toUri.toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${scratch.resolve("metastore_db")}" +
          ";create=true")
      .getOrCreate()
  }

  val sf0001 = "/root/testdata/sf0.001"

  /** Sum of stage input bytes (taskMetrics) while `body` runs — the
    * shared harness of the layout/pruning measurement specs. The
    * listener bus is async; the fixed drain sleep is the one flake
    * point, kept in ONE place.
    */
  def bytesReadDuring(body: => Unit): Long = {
    val read = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        read.addAndGet(s.stageInfo.taskMetrics.inputMetrics.bytesRead): Unit
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(500) }
    finally spark.sparkContext.removeSparkListener(l)
    read.get()
  }
}
