package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Determinism._

/** Structured-Streaming twins of the declared event-time operators
  * (SURVEY.md §2.9 capability row).
  *
  * Each transform is a pure DataFrame → DataFrame function that works on
  * BOTH a batch DataFrame and a `readStream` DataFrame — Spark defines
  * event-time windows identically in both modes, which is the
  * batch–stream equivalence guarantee CapabilitySpec asserts (a
  * MemoryStream fed the same rows must produce the batch answer).
  *
  * At production scale these run with `readStream.format("kafka"|"parquet")`
  * sources, checkpointed sinks, and the watermark bounding state size:
  * state per key is O(open windows), late rows beyond the watermark are
  * dropped instead of accumulating unbounded state across 1000 executors.
  */
object Streaming {

  /** Tumbling 1h counts/sums per event type with a 10-minute watermark —
    * the streaming twin of q30. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumRound(col("value"), 2).as("sv"))
      .select(col("window.start").as("win"), col("event_type"), col("n"), col("sv"))

  /** Sliding 1h/15min totals — streaming twin of q31. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsumRound(col("value"), 2).as("sv"))
      .select(col("window.start").as("win_start"), col("n"), col("sv"))

  /** Session windows with a 30-minute gap per user — streaming twin of
    * q32 via the native `session_window` operator (labels differ from the
    * batch-declared lag/cumsum formulation; window extents are identical). */
  def sessionAggregates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsumRound(col("value"), 2).as("sv"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
              col("session_window.end").as("sess_end"), col("n_events"), col("sv"))

  /** Streaming dedup on the q33 key set — one row per key, with the
    * watermark variant bounding state size. Keeper semantics differ
    * from q33 by design: streaming keeps the first-ARRIVED row (state
    * insertion order) and batch `dropDuplicates` keeps an arbitrary
    * row, so only key sets and counts are comparable across the two —
    * q33's deterministic min-(ts, event_id) keeper is the batch answer
    * when row identity matters (its CapabilitySpec check compares
    * counts for exactly this reason). */
  def streamingDedup(events: DataFrame, withinWatermark: Boolean): DataFrame = {
    val keys = Seq("user_id", "event_type")
    if (withinWatermark)
      events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)
  }

  /** Stream-stream interval join — the attribution shape: each purchase
    * joins the same user's views from the preceding 30 minutes. Both
    * sides carry watermarks and the join condition bounds event time in
    * BOTH directions; together those let Spark expire join state (a view
    * older than watermark + 30min can never match a future purchase, so
    * its state row is dropped) — without the time bound, stream-stream
    * join state grows without limit at 100 TB/day rates. The same
    * function on batch inputs plans as a plain theta join with identical
    * semantics, which is what StreamingSpec's batch≡stream test pins.
    *
    * `joinType` "left_outer" gives the attribution complement: views
    * with NO purchase in their window. In streaming, an outer null row
    * is emitted only once BOTH watermarks pass the view's join window
    * (before that a matching purchase could still arrive) — the test
    * advances the watermark with a late sentinel row to flush them. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
                       joinType: String = "inner"): DataFrame = {
    val v = views
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"), col("value"))
    v.join(p,
        col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        joinType)
      .select(coalesce(col("v_user"), col("p_user")).as("user_id"),
              col("view_id"), col("purchase_id"),
              col("v_ts"), col("p_ts"), col("value"))
  }

  /** Stream-static enrichment: each micro-batch left-joins the static
    * dimension as an ordinary batch side — no streaming state, no
    * watermark, because the static side is complete at every trigger
    * (Spark re-plans it per batch, picking up dimension updates between
    * micro-batches). The production shape for decorating an event
    * stream with a dimension table: broadcast the dimension when it
    * fits, bucket both sides on the key when it doesn't. */
  def enrichWithDimension(stream: DataFrame, dim: DataFrame,
                          streamKey: String, dimKey: String): DataFrame =
    stream.join(dim, stream(streamKey) === dim(dimKey), "left")

  /** Streaming → RDBMS: `foreachBatch` turns each micro-batch into a
    * bounded DataFrame and reuses the batch JDBC writer. The write itself
    * is AT-LEAST-ONCE (a retried micro-batch appends again); every row is
    * stamped with its `batch_id` so a downstream MERGE / `DELETE WHERE
    * batch_id = ?` pre-step can de-duplicate retries into exactly-once —
    * without the stamp callers cannot tell a retry from new data.
    * Returns the configured writer; `.start()` is the caller's side
    * effect. */
  def jdbcSink(stream: DataFrame, url: String, table: String,
               user: String, password: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.sources.Sources.jdbcWriter(
        batch.withColumn("batch_id", lit(batchId)),
        url, table, user, password, numPartitions = 2).save()
    }
}
