package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source token-budget admission — the quota/admission-
  * control half of corpus curation: every source may contribute at most
  * `budget` tokens to the corpus; once the running total passes the
  * budget, further docs from that source are rejected (prefix-cap rule:
  * EVERY doc's tokens count toward the running total, so the admitted
  * set is exactly "docs whose cumulative token sum ≤ budget" — the same
  * set a batch window cumsum selects, which keeps streaming and batch
  * answers identical and the batch form SQL-oracle-checkable, see the
  * `text_token_budget` query).
  *
  * PRECONDITION (API contract, not just a test assumption): a source's
  * docs must arrive in ascending doc_id order ACROSS micro-batches —
  * within one batch [[admit]] sorts, but if batch N+1 delivers a doc_id
  * below one batch N already admitted, the stream's cumsum visits docs
  * in a different order than the batch window's and the stream ≡ batch
  * identity silently breaks. The state therefore carries the max doc_id
  * seen per source and [[admit]] FAILS FAST (IllegalStateException
  * naming source and ids) on a violation instead of diverging — the CDC
  * `seq`-ordering analogy: re-deliveries of the SAME id (at-least-once
  * replay) are fine upstream of the dedup, but a genuinely late NEW id
  * means the feed is not the ordered feed the operator is defined over.
  *
  * Within-batch buffering: each (source, micro-batch) group is
  * materialized on heap to sort by doc_id — bounded by one source's rows
  * in ONE micro-batch (micro-batch sizing controls it), not by history;
  * long-run state per source is two longs (used tokens + max doc_id), so
  * a million sources cost ~16 MB of state. `QuotaSpec` pins stream ≡
  * batch and the out-of-order fail-fast.
  */
object Quota {

  case class DocTokens(source: String, doc_id: Long, n_tokens: Long)
  case class Admission(
      source: String, doc_id: Long, n_tokens: Long, admitted: Boolean,
      used_after: Long)
  /** Per-source state: running token total + highest doc_id processed. */
  case class SourceState(used: Long, max_doc_id: Long)

  def admit(
      docs: Dataset[DocTokens], budget: Long): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[SourceState, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[SourceState]) =>
          val st = state.getOption.getOrElse(SourceState(0L, Long.MinValue))
          var used = st.used
          val batch = rows.toSeq.sortBy(_.doc_id)
          batch.headOption.filter(_.doc_id <= st.max_doc_id).foreach { r =>
            throw new IllegalStateException(
              s"Quota.admit: source '$src' delivered doc_id ${r.doc_id} " +
                s"after already processing doc_id ${st.max_doc_id} — " +
                "cross-batch doc_id order is an API precondition (the " +
                "stream ≡ batch cumsum identity needs one visit order)")
          }
          val out = batch.map { r =>
            used += r.n_tokens
            Admission(src, r.doc_id, r.n_tokens, used <= budget, used)
          }
          state.update(SourceState(used,
            batch.lastOption.map(_.doc_id).getOrElse(st.max_doc_id)))
          out.iterator
      }
  }
}
