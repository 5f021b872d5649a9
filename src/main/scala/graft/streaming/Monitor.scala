package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability — the progress ledger a standing deployment
  * alarms on. Spark already emits a `StreamingQueryProgress` per
  * micro-batch; this listener turns that firehose into a bounded,
  * queryable table of the numbers an operator actually pages on:
  * rows/sec, batch duration, state rows (leak detection), and watermark
  * lag (the stream falling behind event time).
  *
  * Design constraints, in order:
  *  - the listener callback runs on the listener-bus thread — it must
  *    only append to a local buffer (no Spark actions, no I/O);
  *  - memory is bounded: a ring of the last `capacity` batches per
  *    query (a standing job emits millions of progress events — the
  *    monitor must not become its own leak);
  *  - reading is a plain local DataFrame (`snapshot`), so dashboards /
  *    alert rules are ordinary Spark SQL over it, and a periodic job
  *    can append the snapshot to a parquet history table for retention
  *    beyond the ring.
  *
  * `MonitorSpec` drives a watermarked aggregation through it and pins:
  * every batch captured (until the ring evicts), state rows visible,
  * watermark monotone, and the ring bound enforced.
  */
class Monitor(capacity: Int = 1024) extends StreamingQueryListener {
  import Monitor.BatchProgress

  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[BatchProgress]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryIdle(e: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
    buf.addLast(BatchProgress(
      p.id.toString, p.runId.toString,
      Option(p.name).getOrElse(""), p.batchId, p.timestamp,
      p.numInputRows, p.inputRowsPerSecond,
      p.batchDuration, stateRows, stateBytes,
      Option(p.eventTime.get("watermark")).getOrElse("")))
    // ring bound: drop oldest past capacity (single-writer bus thread,
    // so size/poll has no race worth guarding beyond the deque's own)
    while (buf.size() > capacity) buf.pollFirst()
  }

  /** The captured ledger as a local DataFrame (newest last). */
  def snapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    buf.iterator().asScala.toSeq.toDF()
  }

  /** Convenience alarm predicate: queries whose newest batch holds more
    * than `maxStateRows` — the state-leak tripwire. */
  def stateAlarms(spark: SparkSession, maxStateRows: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("batch_id").desc)
    snapshot(spark)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("state_rows") > maxStateRows)
      .drop("rn")
  }
}

object Monitor {
  case class BatchProgress(
      query_id: String, run_id: String, name: String, batch_id: Long,
      ts: String, num_input_rows: Long, rows_per_sec: Double,
      batch_duration_ms: Long, state_rows: Long, state_bytes: Long,
      watermark: String)

  /** Attach a fresh monitor to the session's listener bus. */
  def attach(spark: SparkSession, capacity: Int = 1024): Monitor = {
    val m = new Monitor(capacity)
    spark.streams.addListener(m)
    m
  }
  def detach(spark: SparkSession, m: Monitor): Unit =
    spark.streams.removeListener(m)
}
