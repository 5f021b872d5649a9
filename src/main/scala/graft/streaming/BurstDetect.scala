package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key burst detection on Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState` (typed
  * state VARIABLES with independent lifetimes instead of one opaque
  * state blob, per-variable TTL, timers). The operator: an alert fires
  * for every error event that is the `minCount`-th-or-later error of
  * its user within the trailing `window` of EVENT time — the
  * incident-escalation rule every on-call pipeline runs ("page when a
  * user hits N errors inside W").
  *
  * Semantics are deliberately batch-identical: an alert row is exactly
  * a row of the batch RANGE-frame window count
  * (`count(*) OVER (PARTITION BY user ORDER BY ts RANGE W PRECEDING)`)
  * with count ≥ minCount, which keeps the streaming form
  * SQL-oracle-checkable (`events_burst_alerts` gate query = the DuckDB
  * RANGE window) while the spec pins what the oracle cannot see
  * (cross-micro-batch state carry, pruning).
  *
  * State per key is ONE list of event-time stamps, pruned on every
  * arrival to the trailing window — state size is the key's peak
  * in-window burst count, never its history. (Eviction here is
  * event-time-driven by the data itself; a standing deployment with
  * keys that go quiet forever adds a processing-time TTL on the state
  * variable — the `ttl` parameter — and accepts that a key silent
  * longer than the TTL restarts its count. TTL is exactly the
  * per-variable knob transformWithState adds over fMGWS.)
  *
  * PRECONDITION (the [[Quota.admit]] contract, same reasoning): a key's
  * events must not regress in event time ACROSS micro-batches — within
  * one batch rows are sorted here, but a batch delivering an event
  * older than one already counted would visit timestamps in a
  * different order than the batch window's and silently diverge. The
  * processor fails fast (IllegalStateException naming key and stamps)
  * instead — re-deliveries of in-window timestamps are indistinguishable
  * from genuine repeat errors and belong upstream of a dedup, exactly
  * as in the CDC `seq` contract.
  */
object BurstDetect {

  case class ErrEvent(user_id: Long, ts_us: Long)
  case class Alert(user_id: Long, ts_us: Long, n_window: Long)

  /** The per-key fold both detector variants run: read the stamp list,
    * fail fast on cross-batch time regression, prune-and-count each
    * sorted arrival, write the list back.
    *
    * The in-window stamps live in a mutable ArrayDeque while folding:
    * every stamp enters and leaves the deque exactly once, so a batch
    * costs O(batch log batch + window) per key — the natural sliding-
    * window amortization. (The previous immutable-Vector fold rebuilt
    * the window per arrival (`dropWhile ... :+`), O(burst²) for a hot
    * key: a bot erroring every few seconds across a 6 h window holds
    * ~10⁴ in-window stamps, and quadratic there is ~10⁸ vector ops per
    * batch for that one key.)
    */
  private def foldKey(key: Long, rows: Iterator[ErrEvent],
      recent: ListState[Long], windowUs: Long, minCount: Int)
      : Iterator[Alert] = {
    val sorted = rows.toArray.sortBy(_.ts_us)
    val kept = scala.collection.mutable.ArrayDeque.empty[Long]
    if (recent.exists()) kept ++= recent.get()
    if (sorted.nonEmpty && kept.nonEmpty && kept.last > sorted.head.ts_us)
      throw new IllegalStateException(
        s"BurstDetect: key $key delivered event ts ${sorted.head.ts_us}" +
          s" µs after already counting ts ${kept.last} µs — cross-batch" +
          " event-time order is an API precondition (the stream ≡" +
          " batch RANGE-window identity needs one visit order)")
    val out = Vector.newBuilder[Alert]
    sorted.foreach { e =>
      // prune to the trailing window — boundary INCLUSIVE, matching
      // the RANGE frame (ts' = ts − W is in-window) — then count
      // THIS event in
      val lo = e.ts_us - windowUs
      while (kept.nonEmpty && kept.head < lo) kept.removeHead()
      kept.append(e.ts_us)
      if (kept.size >= minCount) out += Alert(key, e.ts_us, kept.size.toLong)
    }
    if (kept.isEmpty) recent.clear() else recent.put(kept.toArray)
    out.result().iterator
  }

  /** minCount-th error within windowUs (event-time µs) fires an alert. */
  class Detector(windowUs: Long, minCount: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, ErrEvent, Alert] {
    @transient protected var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, ttl)

    override def handleInputRows(key: Long, rows: Iterator[ErrEvent],
        timers: TimerValues): Iterator[Alert] =
      foldKey(key, rows, recent, windowUs, minCount)
  }

  /** Run the detector over a stream of (user_id, ts_us) error events.
    * One shuffle on the key into state-store partitioning; per batch
    * each task folds its keys' sorted slice into the pruned list state.
    */
  def alerts(errors: Dataset[ErrEvent], windowUs: Long, minCount: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Alert] = {
    import errors.sparkSession.implicits._
    errors.groupByKey(_.user_id)
      .transformWithState(new Detector(windowUs, minCount, ttl),
        TimeMode.None(), OutputMode.Append())
  }

  /** A key's warm-start state: the in-window stamps as of the cutoff —
    * exactly what a BATCH query computes from the historical corpus. */
  case class WarmState(user_id: Long, stamps: Array[Long])

  /** [[Detector]] seeded from a batch snapshot — the batch-bootstrap →
    * stream-continue shape every standing deployment starts with: the
    * historical corpus is folded OFFLINE into per-key warm state (the
    * in-window stamp list as of the cutoff), the stream picks up from
    * the cutoff, and alerts from then on are IDENTICAL to a hypothetical
    * stream that had run over all of history ([[BurstDetectSpec]] pins
    * the identity). `handleInitialState` runs once per key on the FIRST
    * micro-batch, before any input rows for that key.
    */
  class WarmStartDetector(windowUs: Long, minCount: Int,
      ttl: TTLConfig = TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, ErrEvent, Alert, WarmState] {
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, ttl)

    override def handleInitialState(key: Long, initial: WarmState,
        timers: TimerValues): Unit =
      if (initial.stamps.nonEmpty) recent.put(initial.stamps.sorted)

    override def handleInputRows(key: Long, rows: Iterator[ErrEvent],
        timers: TimerValues): Iterator[Alert] =
      foldKey(key, rows, recent, windowUs, minCount)
  }

  /** Warm-started run: `initial` is the batch-computed per-key in-window
    * stamp list as of the cutoff; `errors` streams events after it.
    */
  def alertsWarmStarted(errors: Dataset[ErrEvent],
      initial: Dataset[WarmState], windowUs: Long, minCount: Int,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Alert] = {
    import errors.sparkSession.implicits._
    errors.groupByKey(_.user_id)
      .transformWithState(new WarmStartDetector(windowUs, minCount, ttl),
        TimeMode.None(), OutputMode.Append(),
        initial.groupByKey(_.user_id))
  }

  /** An event with REAL event time (timestamp column, watermarked by the
    * caller) — the input shape the timer-driven variant needs: event-time
    * TIMERS only exist relative to a watermark. */
  case class TimedEvent(user_id: Long, ets: java.sql.Timestamp)
  /** kind = "alert" (burst threshold crossed, per arrival) or "closed"
    * (the key went quiet: watermark passed last event + window). */
  case class BurstEvent(user_id: Long, ts_us: Long, n: Long, kind: String)

  /** The timer-driven variant: same alert rule, plus a CLOSE record when
    * a key's burst provably ends — an event-time timer registered at
    * (last event + window) fires once the watermark passes it, emits the
    * final in-window count, and clears the key's state. This is the
    * transformWithState surface the other variants don't touch: TimeMode
    * EventTime, registerTimer/deleteTimer (one live timer per key,
    * re-armed on every arrival), and handleExpiredTimer. The semantic
    * twin of the close record is gap-based sessionization — which the
    * hash gate pins via `cdc_stream_sessions_append` — so this variant
    * is spec-verified ([[BurstDetectSpec]]): close fires exactly when
    * the watermark passes the horizon, state is cleared (a later event
    * starts a fresh count), and re-arming leaves no stale timers.
    */
  class ClosingDetector(windowUs: Long, minCount: Int)
      extends StatefulProcessor[Long, TimedEvent, BurstEvent] {
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        timers: TimerValues): Iterator[BurstEvent] = {
      // exact-µs conversion: getTime is ms-truncated, the sub-ms µs live
      // in getNanos — dropping them would run this variant's horizons at
      // ms granularity while the rest of the family is µs-exact
      val asUs = rows.map(e =>
        ErrEvent(e.user_id,
          e.ets.getTime * 1000L + e.ets.getNanos / 1000L % 1000L)).iterator
      val alerts = foldKey(key, asUs, recent, windowUs, minCount)
        .map(a => BurstEvent(a.user_id, a.ts_us, a.n_window, "alert"))
        .toVector
      // re-arm THE key's close timer at (last stamp + window): timers are
      // per-key wall-registry entries in ms, one live timer here — drop
      // the stale one or the earlier horizon would fire a bogus close
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      if (recent.exists()) {
        var lastUs = Long.MinValue
        val it = recent.get()
        while (it.hasNext) lastUs = it.next() // stamps are sorted; last wins
        // CEIL to ms: timers are ms-granular, and flooring a µs horizon
        // would let the close fire up to 1 ms before the watermark truly
        // passed (last + window)
        getHandle.registerTimer((lastUs + windowUs + 999L) / 1000L)
      }
      alerts.iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[BurstEvent] = {
      val stamps = if (recent.exists()) recent.get().toVector else Vector.empty
      recent.clear()
      if (stamps.isEmpty) Iterator.empty
      else Iterator.single(
        BurstEvent(key, stamps.last, stamps.size.toLong, "closed"))
    }
  }

  /** Timer-driven run over a WATERMARKED timestamp stream. */
  def alertsWithClose(events: Dataset[TimedEvent], windowUs: Long,
      minCount: Int): Dataset[BurstEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ClosingDetector(windowUs, minCount),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
