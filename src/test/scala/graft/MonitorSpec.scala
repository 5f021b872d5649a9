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
}
