package graft.streaming

import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.util.LongAccumulator

/** The ONE bucket-state pairing step shared by every streaming
  * incremental-index operator ([[StreamDedup]] LSH buckets, [[StreamSim]]
  * IVF cells): an arriving id pairs with every prior occupant and with
  * earlier admissions in the same batch, the occupancy cap bounds a
  * degenerate bucket's fan-out to O(cap²) with drops counted into the
  * caller's accumulator, and the idle-TTL clock renews on every touch.
  * Factoring it here keeps the cap/TTL/emit semantics from drifting
  * between the text and embedding streams — the same single-source
  * discipline as `TextDedup.bandKey` / `verifyJaccardCore`.
  */
private[streaming] object BucketState {

  /** Process one bucket's micro-batch arrivals against its keyed state.
    * Returns canonical (min, max) id pairs; mutates `state` (admissions
    * appended, TTL renewed, or removed on timeout).
    */
  def pairArrivals(
      arrivals: Iterator[Long],
      state: GroupState[Array[Long]],
      maxBucket: Int,
      idleTtlMs: Option[Long],
      dropped: Option[LongAccumulator],
      label: String): Iterator[(Long, Long)] = {
    if (state.hasTimedOut) {
      // idle past the TTL: drop the bucket — later arrivals restart it
      // empty (bounded-recall-loss semantics documented on the callers)
      state.remove()
      Iterator.empty
    } else {
      val prior = state.getOption.getOrElse(Array.empty[Long])
      val fresh = arrivals.toArray.distinct.sorted.filterNot(prior.contains)
      // the cap bounds WITHIN-batch fan-out too: only occupants that fit
      // under the cap emit pairs (one catch-up batch delivering B
      // degenerate ids must emit O(cap²), not B²); members beyond the cap
      // enter neither the pair set nor state. Every drop counts into the
      // accumulator (nonzero = the stream's pair set has diverged from
      // the un-capped batch operator); stderr warns on the crossing batch.
      val room = math.max(0, maxBucket - prior.length)
      val admitted = fresh.take(room)
      if (fresh.length > room) {
        dropped.foreach(_.add(fresh.length - room))
        if (prior.length < maxBucket)
          Console.err.println(s"[graft] $label: bucket capped at " +
            s"$maxBucket occupants — ${fresh.length - room} arrivals " +
            "dropped from pairing")
      }
      val out = admitted.zipWithIndex.flatMap { case (id, i) =>
        (prior.iterator ++ admitted.iterator.take(i)).map(o =>
          (math.min(o, id), math.max(o, id)))
      }
      state.update(prior ++ admitted)
      // renew the idle clock on every touch — eviction hits only buckets
      // no arrival has refreshed for the whole TTL
      idleTtlMs.foreach(state.setTimeoutDuration)
      out.iterator
    }
  }
}
