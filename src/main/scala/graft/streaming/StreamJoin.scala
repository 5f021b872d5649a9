package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming join class the
  * stream-static enrichment path cannot express: BOTH sides arrive over
  * time, and a match is defined by key equality plus an event-time window
  * (`rightTs ∈ [leftTs − lower, leftTs + upper]`). The canonical shapes:
  * error events paired with the same entity's preceding activity,
  * impressions joined to conversions within an attribution window, a CDC
  * change joined to the metric samples it explains.
  *
  * Scale contract (how Structured Streaming executes this):
  *
  *  - both inputs shuffle once on the join key into the SAME state store
  *    partitioning — per micro-batch each task joins its batch slice
  *    against the buffered other side locally, no rebroadcast, no
  *    re-scan of history;
  *  - state is bounded by the WATERMARK, not the stream's lifetime: with
  *    watermarks on both event-time columns and the time-range condition
  *    in the join predicate, Spark derives per-side state watermarks and
  *    evicts rows that can no longer match any future in-watermark row —
  *    state ≈ (events per key-time window) × (interval + delay), the
  *    quantity `StreamJoinSpec` pins by feeding hours of data and
  *    asserting buffered rows stay ≈ one window, not the feed;
  *  - INNER join semantics are exactly the batch interval join over all
  *    non-late data (Spark never drops an in-watermark match; rows later
  *    than the delay are dropped — the documented trade every watermarked
  *    operator makes). The `events_stream_join` gate query pins the
  *    batch identity through DuckDB; the spec pins cross-micro-batch
  *    matching and the late-drop semantics.
  *
  * Inputs must carry disjoint column names (alias before calling — the
  * join would otherwise be ambiguous); `keep` selects the output columns.
  */
object StreamJoin {

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      lowerSec: Long,
      upperSec: Long,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    require(lowerSec + upperSec >= 0,
      s"empty interval: [t-$lowerSec s, t+$upperSec s]")
    require(Set("inner", "left_outer", "full_outer")(joinType),
      s"intervalJoin supports inner|left_outer|full_outer, got '$joinType'")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond: Column =
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerSec SECOND") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperSec SECOND")
    // left_outer: a left row with no match emits null-padded ONLY once
    // the query watermark passes its match horizon (leftTs + upper) —
    // before that a matching right row could still arrive. The query
    // watermark is the MIN across both inputs' (max event time − delay),
    // Spark's default multipleWatermarkPolicy — the lagging side
    // governs. The delayed emission is therefore part of the semantics,
    // not a quirk: an unmatched result is a PROVEN absence over the full
    // interval, which is why the spec drives the watermark forward to
    // collect them. A finite drain (AvailableNow) that never advances
    // the watermark past the horizon reports matches only — document at
    // call sites. full_outer adds the mirrored rule for the right side:
    // an unmatched right row emits once the watermark passes
    // rightTs + lower (the latest a future left row could reach back).
    l.join(r, cond, joinType)
  }
}
