package graft

import graft.streaming.BurstDetect
import graft.streaming.BurstDetect.{Alert, ErrEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** transformWithState burst-detector contract: the alert set equals the
  * batch RANGE-window count restricted to count ≥ minCount, state
  * carries across micro-batches, the trailing-window prune really
  * evicts (boundary inclusive), and an out-of-order feed fails fast
  * instead of silently diverging.
  */
class BurstDetectSpec extends SparkSuite {

  // transformWithState needs the RocksDB provider (per-variable column
  // families); a session CLONE scopes the conf to this suite's queries
  private lazy val rdb: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    graft.streaming.CdcStream.useRocksDBStateStore(s)
    s
  }

  private val W = 100L // window µs, small numbers for exactness

  private def drive(batches: Seq[Seq[ErrEvent]], minCount: Int = 2)
      : Either[Throwable, Seq[Alert]] = {
    import rdb.implicits._
    implicit val sqlCtx = rdb.sqlContext
    val mem = MemoryStream[ErrEvent]
    val name = "burst_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = BurstDetect.alerts(mem.toDS(), W, minCount)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      Right(rdb.table(name).as[Alert].collect().toSeq
        .sortBy(a => (a.user_id, a.ts_us)))
    } catch {
      case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        q.stop(); Left(e)
    }
  }

  test("alerts equal the batch RANGE-window rule, across micro-batches") {
    // user 1: errors at 0, 60, 200 — (0,60) in one window (alert at 60,
    // n=2); 200 is 140 past 60, outside W=100, no alert. user 2: three
    // errors 10 apart SPLIT ACROSS BATCHES — state must carry: alerts
    // at the 2nd (n=2) and 3rd (n=3).
    val got = drive(Seq(
      Seq(ErrEvent(1, 0), ErrEvent(2, 10)),
      Seq(ErrEvent(1, 60), ErrEvent(2, 20)),
      Seq(ErrEvent(1, 200), ErrEvent(2, 30)))).toOption.get
    assert(got === Seq(
      Alert(1, 60, 2), Alert(2, 20, 2), Alert(2, 30, 3)))
  }

  test("trailing-window prune: boundary timestamp still counts, one µs " +
      "older does not") {
    // ts' = ts − W is IN window (RANGE frame inclusivity)
    val inBoundary = drive(Seq(Seq(ErrEvent(7, 0)), Seq(ErrEvent(7, W))))
      .toOption.get
    assert(inBoundary === Seq(Alert(7, W, 2)))
    val outBoundary = drive(Seq(Seq(ErrEvent(7, 0)), Seq(ErrEvent(7, W + 1))))
      .toOption.get
    assert(outBoundary.isEmpty)
  }

  test("state stays pruned: a long in-order feed keeps only the " +
      "in-window stamps (alert counts never exceed the window density)") {
    // 50 errors spaced 40 µs apart: window holds ≤ 3 stamps at a time,
    // so n_window must plateau at 3 — a leak would grow it to 50
    val feed = (0 until 50).map(i => Seq(ErrEvent(9, i * 40L)))
    val got = drive(feed).toOption.get
    assert(got.nonEmpty && got.map(_.n_window).max === 3L)
  }

  test("warm start: batch-bootstrapped state + streamed tail equals the " +
      "full-stream run from the cutoff on") {
    import rdb.implicits._
    implicit val sqlCtx = rdb.sqlContext
    // history: user 1 has stamps {950, 980} in-window at cutoff 1000;
    // user 2's only stamp (10) is already OUT of window; user 3 unseen
    val history = Seq(
      ErrEvent(1, 950), ErrEvent(1, 980), ErrEvent(2, 10))
    val tail = Seq(
      Seq(ErrEvent(1, 1020), ErrEvent(3, 1010)),
      Seq(ErrEvent(2, 1040), ErrEvent(3, 1060)))
    val cutoff = 1000L

    // reference: one stream over history ++ tail, alerts after cutoff
    val full = drive(Seq(history) ++ tail).toOption.get
      .filter(_.ts_us > cutoff)

    // warm start: the batch-computed in-window stamp list per key
    // (exactly what a batch query over the historical corpus yields)
    val warm = history.groupBy(_.user_id).toSeq.map { case (u, evs) =>
      val last = evs.map(_.ts_us).max
      BurstDetect.WarmState(u,
        evs.map(_.ts_us).filter(_ >= last - W).sorted.toArray)
    }
    val mem = MemoryStream[ErrEvent]
    val name = "burstw_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = BurstDetect.alertsWarmStarted(mem.toDS(),
        rdb.createDataset(warm), W, minCount = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    tail.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val got = rdb.table(name).as[BurstDetect.Alert].collect().toSeq
      .sortBy(a => (a.user_id, a.ts_us))
    assert(full.nonEmpty, "fixture must alert after the cutoff")
    assert(got === full,
      s"warm-started run diverged from the full-stream reference: " +
        s"got $got, want $full")
    // the warm stamps really participated: user 1's alert at 1020
    // counts both historical stamps (n=3)
    assert(got.contains(BurstDetect.Alert(1, 1020, 3)))
  }

  test("event-time timers: a quiet key closes its burst once the " +
      "watermark passes last + window, state clears, timers re-arm") {
    import rdb.implicits._
    implicit val sqlCtx = rdb.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val Wus = 1000000L // 1 s window
    val mem = MemoryStream[BurstDetect.TimedEvent]
    val name = "burstc_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = BurstDetect.alertsWithClose(
        mem.toDS().withWatermark("ets", "0 seconds"), Wus, minCount = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def got(): Seq[BurstDetect.BurstEvent] =
      rdb.table(name).as[BurstDetect.BurstEvent].collect().toSeq

    // burst: u1 at 1.0 s and 1.5 s → alert at 1.5 (n=2); timer re-armed
    // from 2.0 s to 2.5 s — the stale timer must NOT fire a close at 2.0
    mem.addData(BurstDetect.TimedEvent(1, ts(1000)))
    q.processAllAvailable()
    mem.addData(BurstDetect.TimedEvent(1, ts(1500)))
    q.processAllAvailable()
    // march the watermark past 2.5 s via another key, then once more so
    // the expired timer's emission surfaces
    mem.addData(BurstDetect.TimedEvent(2, ts(10000)))
    q.processAllAvailable()
    mem.addData(BurstDetect.TimedEvent(2, ts(20000)))
    q.processAllAvailable()
    val afterClose = got()
    assert(afterClose.contains(
      BurstDetect.BurstEvent(1, 1500000L, 2, "alert")))
    assert(afterClose.count(_.kind == "closed") >= 1)
    assert(afterClose.contains(
      BurstDetect.BurstEvent(1, 1500000L, 2, "closed")),
      s"close must carry the burst's last stamp and final count: $afterClose")
    assert(afterClose.count(e => e.user_id == 1 && e.kind == "closed") === 1,
      s"stale timer fired a duplicate close: $afterClose")

    // state cleared by the close: a fresh u1 pair counts from 1, not 3
    mem.addData(BurstDetect.TimedEvent(1, ts(30000)))
    q.processAllAvailable()
    mem.addData(BurstDetect.TimedEvent(1, ts(30500)))
    q.processAllAvailable()
    q.stop()
    val end = got()
    assert(end.contains(BurstDetect.BurstEvent(1, 30500000L, 2, "alert")),
      s"post-close count did not restart: $end")
    assert(!end.exists(e => e.user_id == 1 && e.kind == "alert" && e.n > 2))
  }

  test("hot key: ~10⁴ in-window stamps fold in amortized-linear time " +
      "with exact counts") {
    // one bot-like key whose entire history stays in-window: the r13
    // fold rebuilt an immutable Vector per arrival (O(burst²) — ~10⁸
    // vector ops for this fixture); the deque fold is O(batch + window).
    // Counts pin correctness (n_window = arrival index + 1, every event
    // past minCount alerts); the suite's timeout is the time bound.
    val n = 10000
    val wide = 10L * n // window comfortably covers all stamps
    import rdb.implicits._
    implicit val sqlCtx = rdb.sqlContext
    val mem = MemoryStream[ErrEvent]
    val name = "burst_hot_" + java.util.UUID.randomUUID.toString
      .replace("-", "")
    val q = BurstDetect.alerts(mem.toDS(), wide, minCount = 2)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // two batches so the full 5k-stamp window round-trips ListState
      mem.addData((0 until n / 2).map(i => ErrEvent(7L, i.toLong)))
      q.processAllAvailable()
      mem.addData((n / 2 until n).map(i => ErrEvent(7L, i.toLong)))
      q.processAllAvailable()
      q.stop()
      val got = rdb.table(name).as[Alert].collect().sortBy(_.ts_us)
      assert(got.length === n - 1)
      assert(got.zipWithIndex.forall { case (a, i) =>
        a.ts_us == i + 1L && a.n_window == i + 2L })
    } finally if (q.isActive) q.stop()
  }

  test("out-of-order cross-batch feed fails fast, naming the key") {
    val res = drive(Seq(Seq(ErrEvent(5, 1000)), Seq(ErrEvent(5, 500))))
    assert(res.isLeft)
    val msg = res.swap.toOption.get.getMessage +
      Option(res.swap.toOption.get.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("BurstDetect") || msg.contains("precondition"),
      s"unexpected failure: $msg")
  }
}
