package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The watermark-bounded streaming dedup's two contracts the oracle gate
  * cannot see: dedup state is EVICTED once the watermark passes an
  * entry's horizon (bounded by the reorder window, not the feed), and the
  * documented trade — a duplicate arriving later than the delay after its
  * first copy is re-emitted — really is the semantics, not a bug.
  */
class DedupWithinWatermarkSpec extends SparkSuite {

  private case class Ev(id: Long, tsSec: Long)

  private def drive(batches: Seq[Seq[Ev]], delay: String)
      : (Seq[Long], Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = "dwm_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = mem.toDF()
      .withColumn("ets", timestamp_seconds(col("tsSec")))
      .withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    q.stop()
    (spark.table(name).select("id").collect().map(_.getLong(0)).toSeq,
      stateRows)
  }

  test("in-window duplicates dedup across micro-batches; state evicts " +
      "past the reorder window") {
    // 30 batches, one fresh id each plus a duplicate of the previous id
    // (arrives within the 5 s delay): every id must emit exactly once,
    // and with event time marching 100 s per batch the dedup state must
    // hold ~the reorder window, not all 30 ids
    val batches = (0 until 30).map { i =>
      val fresh = Ev(100L + i, 1000L + 100L * i)
      if (i == 0) Seq(fresh)
      else Seq(fresh, Ev(100L + i - 1, 1000L + 100L * (i - 1) + 2))
    }
    val (got, stateRows) = drive(batches, "5 seconds")
    assert(got.sorted === (0 until 30).map(100L + _))
    assert(stateRows >= 0, "no progress recorded")
    assert(stateRows < 10,
      s"dedup state holds $stateRows rows — watermark eviction not happening")
  }

  test("a duplicate beyond the delay re-emits — the documented trade") {
    // id 7's second copy arrives after the watermark passed its first
    // copy's horizon: state no longer remembers it, so it emits again
    val batches = Seq(
      Seq(Ev(7, 1000)),
      Seq(Ev(8, 5000)), // watermark → 4990, far past 1000 + 5 s
      Seq(Ev(7, 5001)))
    val (got, _) = drive(batches, "5 seconds")
    assert(got.count(_ == 7L) === 2,
      s"late duplicate was not re-emitted: $got")
  }
}
