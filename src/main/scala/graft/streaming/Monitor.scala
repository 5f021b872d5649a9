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
  *    alert rules are ordinary Spark SQL over it; [[retain]] is the
  *    periodic flush that appends the ring's new rows to a parquet
  *    history table — idempotent on (run_id, batch_id) — for retention
  *    beyond the ring (post-incident forensics outlive eviction).
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

  // retention high-water per run_id: the largest batch_id already
  // appended to the history. Seeded from the history itself on the first
  // retain() of this monitor's life (one column-pruned aggregate), then
  // maintained driver-side — steady-state flushes cost zero history reads.
  private val retained =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  @volatile private var retainSeeded = false

  /** Durable retention beyond the ring: append the ring's not-yet-retained
    * rows to a parquet history dir. Idempotent on (run_id, batch_id) —
    * overlapping flushes never duplicate, a monitor restarted mid-history
    * reseeds its high-water from the table, and any flush cadence at
    * least as fast as ring turnover loses nothing to eviction (rows
    * evicted after a flush are already durable; `MonitorSpec` pins
    * gap/dup-freedom across eviction). Call it from the periodic driver
    * job the scaladoc above promises; single caller per monitor (flushes
    * are serialized here, but two monitors on one history dir race).
    * Returns the number of rows appended.
    */
  def retain(spark: SparkSession, historyDir: String): Long = synchronized {
    import scala.jdk.CollectionConverters._
    val rows = buf.iterator().asScala.toVector
    if (rows.isEmpty) return 0L
    if (!retainSeeded) {
      val p = new org.apache.hadoop.fs.Path(historyDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasData = fs.exists(p) && fs.listStatus(p).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (hasData) {
        import org.apache.spark.sql.functions._
        spark.read.parquet(historyDir)
          .groupBy("run_id").agg(max("batch_id").as("hw"))
          .collect()
          .foreach(r => retained.put(r.getString(0), r.getLong(1)))
      }
      retainSeeded = true
    }
    val fresh = rows.filter(r =>
      r.batch_id > retained.getOrDefault(r.run_id, Long.MinValue))
    if (fresh.isEmpty) return 0L
    locally {
      import spark.implicits._
      fresh.toDF().write.mode("append").parquet(historyDir)
    }
    // advance high-waters only after the append landed: an in-JVM write
    // failure retries the same rows; a JVM loss reseeds from the table
    fresh.groupBy(_.run_id).foreach { case (rid, rs) =>
      val mx = rs.map(_.batch_id).max
      retained.put(rid,
        math.max(retained.getOrDefault(rid, Long.MinValue), mx))
    }
    fresh.size.toLong
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
