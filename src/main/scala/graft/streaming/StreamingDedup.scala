package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Near-duplicate detection AT INGEST — the Structured-Streaming twin of
  * the batch SimHash near-dup join ([[graft.operators.Approx.simHashNearDup]],
  * q44). A training-data pipeline at 100 TB/day can't afford to land a
  * day of documents and re-run a corpus-wide dedup batch to discover
  * duplicates it just ingested: this operator flags each arriving
  * document against everything seen within the watermark horizon, as a
  * streaming stage between the source and the sink.
  *
  * Shape: per-document SimHash at the scan (one pass, no state), then
  * the same 4×16-bit band decomposition as the batch join — but instead
  * of a self-join, each band bucket is a `flatMapGroupsWithState` key
  * whose state is the bucket's recent members. A new document compares
  * against ONLY its bucket's members (the LSH guarantee: Hamming ≤ 3 on
  * 64 bits forces at least one of 4 bands to match exactly — the
  * pigeonhole bound the batch twin relies on), and a pair is emitted at
  * its MINIMAL matching band only (the same emit-once rule as the batch
  * band joins, decided from the full signatures both sides carry), so
  * re-delivered band collisions never duplicate a pair.
  *
  * Scale properties: state is per (band, key) bucket, updated by exactly
  * one task per micro-batch, stored in the state store (RocksDB-backed on
  * a cluster — the provider swap is pinned in StreamingSpec) and bounded
  * by the watermark: members older than the event-time horizon are
  * pruned on every bucket update, and idle buckets evict wholesale via
  * event-time timeout. Per-bucket membership is bounded by (bucket
  * collision rate × horizon ingest volume), the streaming analogue of the
  * batch join's per-bucket quadratic term — widen the horizon and a hot
  * bucket (a burst of boilerplate documents) grows linearly, each
  * arrival paying one Hamming check per retained member.
  *
  * The per-document signature uses the scalar [[TextFunctions.simhash64]]
  * column (interpreted HOF): unlike the BATCH join — where the explode +
  * 64-partial-aggregate shape is 270× faster because signatures fold on
  * both sides of a shuffle — a streaming stage computes each signature
  * exactly once at ingest, and an aggregate before a stateful operator
  * is a second stateful operator Structured Streaming would reject in
  * this position. Values are identical (integer majority votes,
  * order-independent), which the batch≡stream equivalence test pins.
  *
  * Emits `(a, b, hamming)` with `a < b` — the batch twin's exact columns;
  * the equivalence test asserts set-equality of the pair sets.
  */
object StreamingDedup {

  // Carries the watermarked TIMESTAMP column itself (not a projection of
  // it): event-time timeout requires the watermark column to survive up
  // to the stateful operator.
  case class DocBand(doc_id: Long, ts: Timestamp, sh: Long, band: Int, key: Long)
  case class Member(id: Long, sh: Long, tsUs: Long)
  case class CandPair(a: Long, b: Long, hamming: Int)

  private def toMicros(ts: Timestamp): Long =
    (ts.getTime - ts.getNanos / 1000000) * 1000L + ts.getNanos / 1000

  private def bandOf(sh: Long, b: Int): Long = (sh >>> (b * 16)) & 0xFFFFL

  /** @param docs      streaming DataFrame with (doc_id: Long,
    *                  ts: Timestamp, text: String)
    * @param maxHamming near-dup criterion on the 64-bit signatures; the
    *                  4-band decomposition guarantees recall only ≤ 3
    * @param horizon   event-time watermark / dedup lookback, e.g. "10 minutes"
    */
  def simhashNearDupStream(docs: DataFrame, maxHamming: Int = 3,
                           horizon: String = "10 minutes"): Dataset[CandPair] = {
    require(maxHamming <= 3, "4 bands of 16 bits guarantee recall only up to Hamming 3")
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    val horizonMicros = horizonUs.days * 86400000000L + horizonUs.microseconds
    docs
      .withWatermark("ts", horizon)
      .select(col("doc_id"), col("ts"), TextFunctions.simhash64(col("text")).as("sh"))
      .select(col("doc_id"), col("ts"), col("sh"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("band", "key")))
      .as[DocBand]
      .groupByKey(d => (d.band, d.key))
      .flatMapGroupsWithState[List[Member], CandPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rows, state: GroupState[List[Member]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val retained = state.getOption.getOrElse(Nil).filter(_.tsUs >= wmUs)
          if (state.hasTimedOut) {
            // No new arrivals — just prune (or drop) the bucket.
            if (retained.isEmpty) state.remove()
            else {
              state.update(retained)
              state.setTimeoutTimestamp(
                math.max(retained.map(_.tsUs).max / 1000L + horizonMicros / 1000L,
                  state.getCurrentWatermarkMs() + 1))
            }
            Iterator.empty
          } else {
            // Sort arrivals for a deterministic state list; the emitted
            // pair SET is arrival-order invariant regardless (membership
            // and the minimal-band rule depend only on the signatures).
            val incoming = rows.toSeq.sortBy(d => (toMicros(d.ts), d.doc_id))
            var members = retained
            val out = Seq.newBuilder[CandPair]
            for (d <- incoming) {
              // Idempotent under source re-delivery: a doc_id already in
              // the bucket neither re-pairs nor duplicates its membership.
              if (!members.exists(_.id == d.doc_id)) {
                for (m <- members) {
                  // Emit-once: skip if an earlier band also matches (that
                  // band's bucket owns the pair) — the streaming form of
                  // the batch joins' band_match_before predicate.
                  val earlier = (0 until band).exists(b2 =>
                    bandOf(d.sh, b2) == bandOf(m.sh, b2))
                  if (!earlier) {
                    val dist = java.lang.Long.bitCount(d.sh ^ m.sh)
                    if (dist <= maxHamming)
                      out += CandPair(math.min(d.doc_id, m.id),
                        math.max(d.doc_id, m.id), dist)
                  }
                }
                members = Member(d.doc_id, d.sh, toMicros(d.ts)) :: members
              }
            }
            state.update(members)
            state.setTimeoutTimestamp(
              math.max(members.map(_.tsUs).max / 1000L + horizonMicros / 1000L,
                state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

}
