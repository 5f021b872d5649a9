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
    * sorted arrival, write the list back. */
  private def foldKey(key: Long, rows: Iterator[ErrEvent],
      recent: ListState[Long], windowUs: Long, minCount: Int)
      : Iterator[Alert] = {
    val sorted = rows.toArray.sortBy(_.ts_us)
    var kept = if (recent.exists()) recent.get().toVector else Vector.empty
    kept.lastOption.filter(sorted.nonEmpty && _ > sorted.head.ts_us)
      .foreach { last =>
        throw new IllegalStateException(
          s"BurstDetect: key $key delivered event ts ${sorted.head.ts_us}" +
            s" µs after already counting ts $last µs — cross-batch" +
            " event-time order is an API precondition (the stream ≡" +
            " batch RANGE-window identity needs one visit order)")
      }
    val out = Vector.newBuilder[Alert]
    sorted.foreach { e =>
      // prune to the trailing window — boundary INCLUSIVE, matching
      // the RANGE frame (ts' = ts − W is in-window) — then count
      // THIS event in
      kept = kept.dropWhile(_ < e.ts_us - windowUs) :+ e.ts_us
      if (kept.size >= minCount) out += Alert(key, e.ts_us, kept.size)
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
}
