package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget mixture sampling — the ingest-time twin of
  * [[graft.operators.Sampling.quotaSampleBudgets]] (VERDICT r10 #7,
  * the last batch-only stage of the training pipeline): documents
  * arriving on a stream fill each group's token budget until it is
  * exhausted, emitting exactly the docs the batch operator would keep
  * on the same corpus in the same order. The state per group is ONE
  * (tokens, picks) pair of longs, carried across microbatches by the
  * state store — a restart resumes the fill where the checkpoint left
  * off, and a filled group's state stops changing the selection (later
  * docs still advance the counters, exactly like the batch operator's
  * post-cut rows, so the two stay replayable against each other).
  *
  * Ordering contract (same as [[StreamingPacking]]): within a
  * microbatch a group's documents fill in (rk, doc_id) order — the
  * batch operator's fill order — so a batch's output is deterministic;
  * ACROSS microbatches the order is arrival order. Feed batches in
  * (rk, doc_id) order and the stream selection equals
  * `quotaSampleBudgets` row-for-row (proven in StreamingSpec).
  *
  * Scale shape: state is O(groups) pairs of longs — the minimum any
  * budget fill needs — and the only shuffle is the groupByKey exchange
  * on the group key carrying (group, id, n, rk) tuples, never text.
  * Group count is small by definition (a mixture is a config), so the
  * per-group serialization this implies is the SAME boundary the batch
  * operator's two-phase prefix sum exists to avoid in one big batch —
  * on a stream the microbatch bounds the work per trigger instead.
  */
object StreamingQuota {

  case class DocIn(grp: String, doc_id: Long, n_tokens: Long, rk: String)
  case class QuotaState(tok: Long, picks: Long)
  case class QuotaOut(doc_id: Long, grp: String, n_tokens: Long,
                      cum_before: Long, pick_pos: Long)

  /** The shared per-group fill: (rk, doc_id)-sorted microbatch docs
    * advance the (tokens, picks) counters; docs whose exclusive running
    * sum is still under `budget` are emitted. budget <= 0 emits nothing
    * (the whitelist arm) while still advancing state. */
  private def fill(grp: String, it: Iterator[DocIn],
                   state: GroupState[QuotaState],
                   budget: Long): Iterator[QuotaOut] = {
    var tok = state.getOption.map(_.tok).getOrElse(0L)
    var picks = state.getOption.map(_.picks).getOrElse(0L)
    var prev = Option.empty[(String, Long)]
    val out = it.toVector.sortBy(d => (d.rk, d.doc_id)).flatMap { d =>
      require(d.n_tokens >= 0,
        s"quotaStream: n_tokens must be >= 0 (doc ${d.doc_id})")
      require(!prev.contains((d.rk, d.doc_id)),
        s"quotaStream: duplicate (rk, doc_id) = (${d.rk}, ${d.doc_id}) " +
          s"in group $grp — fill order undefined")
      prev = Some((d.rk, d.doc_id))
      picks += 1
      val cum = tok
      tok += d.n_tokens
      if (cum < budget) Some(QuotaOut(d.doc_id, grp, d.n_tokens, cum, picks))
      else None
    }
    state.update(QuotaState(tok, picks))
    out.iterator
  }

  /** `docs` must expose (grp, doc_id, n_tokens, rk). Groups absent from
    * `budgets` contribute nothing (the whitelist contract). Works
    * identically in batch mode (each group arrives complete in one
    * call). Negative token counts and duplicate (rk, doc_id) keys
    * within a microbatch fail loudly, mirroring the batch operator's
    * scan guards; a replay ACROSS batches is indistinguishable from a
    * new document without unbounded id state — deduplicate upstream
    * (dropDuplicatesWithinWatermark) if the source is at-least-once. */
  def quotaStreamBudgets(docs: DataFrame,
                         budgets: Map[String, Long]): Dataset[QuotaOut] = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ > 0), "every budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.as[DocIn]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[QuotaState, QuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (grp, it, state: GroupState[QuotaState]) =>
          fill(grp, it, state, budgets.getOrElse(grp, 0L))
      }
  }

  /** Uniform-budget form (the q68 shape): every group gets `budget`.
    * Groups are open-ended here — any arriving group fills up to the
    * uniform budget, matching [[graft.operators.Sampling.quotaSample]].
    * Implemented directly rather than via a budgets map because the
    * group universe is unknown on a stream. */
  def quotaStream(docs: DataFrame, budget: Long): Dataset[QuotaOut] = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.as[DocIn]
      .groupByKey(_.grp)
      .flatMapGroupsWithState[QuotaState, QuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (grp, it, state: GroupState[QuotaState]) =>
          fill(grp, it, state, budget)
      }
  }
}
