package graft

import graft.streaming.Monitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Monitor contract: every micro-batch lands in the ledger (until the
  * ring evicts), state rows and watermark advance are visible, the ring
  * bound holds, and the state-leak alarm trips on the newest batch.
  */
class MonitorSpec extends SparkSuite {

  private case class Ev(k: Long, tsSec: Long)

  test("progress ledger captures batches, state rows, monotone " +
      "watermark; ring bound and state alarm work") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mon = Monitor.attach(spark, capacity = 4)
    try {
      val mem = MemoryStream[Ev]
      val name = "mon_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = mem.toDF()
        .select(col("k"), timestamp_seconds(col("tsSec")).as("ets"))
        .withWatermark("ets", "10 seconds")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      (1 to 6).foreach { i =>
        mem.addData(Ev(i.toLong, i * 100L))
        q.processAllAvailable()
      }
      q.stop()
      // listener bus is async — poll until the ledger stops growing
      def ledger() = mon.snapshot(spark)
        .filter(col("name") === name).orderBy("batch_id").collect()
      var led = ledger()
      (1 to 20).iterator.takeWhile { _ =>
        Thread.sleep(200)
        val n = ledger()
        val grew = n.length != led.length
        led = n
        grew
      }.foreach(_ => ())
      assert(led.length > 1 && led.length <= 4,
        s"ring bound violated or nothing captured: ${led.length}")
      val states = led.map(_.getAs[Long]("state_rows"))
      assert(states.last >= 1, states.mkString(","))
      val wms = led.map(_.getAs[String]("watermark")).filter(_.nonEmpty)
      assert(wms.length > 1 && wms.sameElements(wms.sorted),
        s"watermark not monotone: ${wms.mkString(",")}")
      // the leak tripwire: newest batch holds ≤ 6 keys → alarms at 0,
      // stays quiet at 100
      assert(mon.stateAlarms(spark, maxStateRows = 0)
        .filter(col("name") === name).count() === 1)
      assert(mon.stateAlarms(spark, maxStateRows = 100)
        .filter(col("name") === name).count() === 0)
    } finally Monitor.detach(spark, mon)
  }

  test("retain: periodic flushes land every batch exactly once across " +
      "ring eviction; a reseeded monitor never re-appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hist = java.nio.file.Files
      .createTempDirectory("graft_mon_hist").toString + "/history"
    // tiny ring (2) so eviction happens constantly: without the per-batch
    // flush cadence, most batches would be lost to the ring before any
    // retention — the test proves flush-then-evict keeps them durable
    val mon = Monitor.attach(spark, capacity = 2)
    // a second, never-flushed monitor captures the same stream: its
    // retain() at the end exercises the RESEED path (fresh high-water
    // map, ring rows already durable via mon's flushes)
    val mon2 = Monitor.attach(spark, capacity = 2)
    try {
      val mem = MemoryStream[Ev]
      val name = "monr_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = mem.toDF()
        .select(col("k"), timestamp_seconds(col("tsSec")).as("ets"))
        .withWatermark("ets", "10 seconds")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      val nBatches = 6
      (1 to nBatches).foreach { i =>
        mem.addData(Ev(i.toLong, i * 100L))
        q.processAllAvailable()
        // wait for the async listener to deliver batch i-1's progress,
        // then flush — the cadence contract (≥ ring turnover)
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (mon.snapshot(spark).filter(col("name") === name)
            .agg(max("batch_id")).collect()(0).isNullAt(0) ||
          mon.snapshot(spark).filter(col("name") === name)
            .agg(max("batch_id")).collect()(0).getLong(0) < i - 1) {
          assert(System.nanoTime() < deadline, "listener never delivered")
          Thread.sleep(50)
        }
        mon.retain(spark, hist)
      }
      q.stop()
      Thread.sleep(300) // drain any final progress event
      mon.retain(spark, hist) // overlapping flush: must not duplicate
      val rows = spark.read.parquet(hist).filter(col("name") === name)
        .select("batch_id").collect().map(_.getLong(0)).sorted
      // every flushed batch exactly once — no duplicates from overlapping
      // flush windows, no gaps despite the size-2 ring having evicted
      // most of the history
      assert(rows.distinct.length === rows.length,
        s"duplicated batches: ${rows.mkString(",")}")
      assert(rows.length >= nBatches - 1,
        s"gapped history: ${rows.mkString(",")}")
      assert(rows.toSeq === (rows.min to rows.max),
        s"non-contiguous: ${rows.mkString(",")}")
      // restart-idempotence: mon2 is a FRESH retainer (empty high-water
      // map) whose ring holds rows mon already made durable — its first
      // retain() reseeds from the table and appends nothing
      assert(mon2.retain(spark, hist) === 0L,
        "reseeded monitor re-appended already-retained rows")
      // and the original monitor's overlapping re-flush is also a no-op
      assert(mon.retain(spark, hist) === 0L)
      val after = spark.read.parquet(hist).filter(col("name") === name)
        .count()
      assert(after === rows.length.toLong)
    } finally {
      Monitor.detach(spark, mon)
      Monitor.detach(spark, mon2)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(hist).getParentFile)
    }
  }
}
