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
  * Admission order is arrival order, with each micro-batch's rows
  * processed in doc_id order (the CDC `seq` analogy — deterministic
  * replay); state per source is ONE long (the running total), so a
  * million sources cost 8 MB of state. `QuotaSpec` pins stream ≡ batch.
  */
object Quota {

  case class DocTokens(source: String, doc_id: Long, n_tokens: Long)
  case class Admission(
      source: String, doc_id: Long, n_tokens: Long, admitted: Boolean,
      used_after: Long)

  def admit(
      docs: Dataset[DocTokens], budget: Long): Dataset[Admission] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, rows, state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            used += r.n_tokens
            Admission(src, r.doc_id, r.n_tokens, used <= budget, used)
          }
          state.update(used)
          out.iterator
      }
  }
}
