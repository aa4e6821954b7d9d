package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source diversity cap — the ingest-time twin of the
  * batch cap ([[graft.operators.Sampling.stratifiedQuota]] / the
  * declared q81 form): at most `k` documents per source survive, the
  * C4/RefinedWeb-style domain cap applied as data ARRIVES instead of
  * in a post-hoc batch window (VERDICT r11 #7 / r12 #6 — the last
  * selection stage without a streaming twin; StreamingQuota covers the
  * token-budget stages the same way).
  *
  * State per source is ONE (kept, seen) pair of longs carried across
  * microbatches by the state store — the minimum any counting cap
  * needs, and the exact streaming analogue of the batch plan's
  * map-side WindowGroupLimit: a hot source that owns 90% of the stream
  * advances `seen` but ships at most `k` rows total, so state size and
  * output are both bounded regardless of skew. A restart resumes the
  * count from the checkpoint.
  *
  * Ordering contract (same as [[StreamingQuota]] / [[StreamingPacking]]):
  * within a microbatch a source's documents rank in (rk, doc_id)
  * order — the batch operator's window order — so each batch is
  * deterministic; ACROSS microbatches rank follows arrival order. Feed
  * batches in (rk, doc_id) order and the stream's selection equals the
  * batch cap row-for-row, src_rank included (proven across three
  * microbatches in StreamingSpec). On an UNORDERED stream the cap is
  * "first k to arrive (batch-ranked)" — still an unbiased sample when
  * rk is a seeded hash, because arrival order within a source is then
  * independent of content.
  *
  * Scale shape: the only exchange is the groupByKey hash partition on
  * `source` carrying (source, doc_id, rk) triples — never text — and
  * per-trigger work is bounded by the microbatch. Duplicate (rk,
  * doc_id) keys within a microbatch fail loudly (the batch guards'
  * convention); a replay ACROSS batches is indistinguishable from a
  * new document without unbounded id state — deduplicate upstream
  * (dropDuplicatesWithinWatermark) if the source is at-least-once.
  */
object StreamingCap {

  case class CapIn(source: String, doc_id: Long, rk: String)
  case class CapState(kept: Long, seen: Long)
  case class CapOut(doc_id: Long, source: String, src_rank: Long)

  /** The shared per-source count: (rk, doc_id)-sorted microbatch docs
    * advance (kept, seen); docs landing at rank <= cap are emitted with
    * their rank. cap <= 0 emits nothing while still counting (the
    * whitelist arm of the quota form). */
  private def cap(source: String, it: Iterator[CapIn],
                  state: GroupState[CapState],
                  k: Long): Iterator[CapOut] = {
    var kept = state.getOption.map(_.kept).getOrElse(0L)
    var seen = state.getOption.map(_.seen).getOrElse(0L)
    var prev = Option.empty[(String, Long)]
    val out = it.toVector.sortBy(d => (d.rk, d.doc_id)).flatMap { d =>
      require(!prev.contains((d.rk, d.doc_id)),
        s"capStream: duplicate (rk, doc_id) = (${d.rk}, ${d.doc_id}) " +
          s"in source $source — rank order undefined")
      prev = Some((d.rk, d.doc_id))
      seen += 1
      if (kept < k) { kept += 1; Some(CapOut(d.doc_id, source, kept)) }
      else None
    }
    state.update(CapState(kept, seen))
    out.iterator
  }

  /** Uniform cap (the q81 shape): every arriving source keeps its first
    * `k` docs in (rk, doc_id)-then-arrival order. The source universe
    * is open-ended — any new source starts counting at zero. `docs`
    * must expose (source, doc_id, rk). Works identically in batch mode
    * (each source arrives complete in one call). */
  def capStream(docs: DataFrame, k: Long): Dataset[CapOut] = {
    require(k > 0, "cap must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.as[CapIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState[CapState, CapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, it, state: GroupState[CapState]) =>
          cap(src, it, state, k)
      }
  }

  /** Per-source quota form (the stratified shape): each source keeps up
    * to its own quota; sources absent from `quotas` contribute nothing
    * (the whitelist contract, matching [[StreamingQuota]]'s budget
    * map) while still advancing their seen counter. */
  def capStreamQuotas(docs: DataFrame,
                      quotas: Map[String, Long]): Dataset[CapOut] = {
    require(quotas.nonEmpty, "quotas must not be empty")
    require(quotas.values.forall(_ > 0), "every quota must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.as[CapIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState[CapState, CapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (src, it, state: GroupState[CapState]) =>
          cap(src, it, state, quotas.getOrElse(src, 0L))
      }
  }
}
