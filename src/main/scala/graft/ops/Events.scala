package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Determinism._
import Tables._

/** Event-time operator family over the `events` stream-shaped table:
  * interval/theta join, as-of join, running/lead-lag/range-frame windows,
  * tumbling/sliding/session windows, keep-first dedup, histogram
  * (SURVEY.md §2.3, §2.5, §2.9).
  *
  * These are the batch formulations of streaming semantics — Spark defines
  * `window()` identically in batch and Structured Streaming, so each
  * builder has a direct `readStream` twin (see graft.streaming). All
  * timestamp arithmetic is done in microseconds (`unix_micros`): the
  * parquet timestamps are µs-encoded (FIXTURES.md; Tables.events adapts
  * if the physical encoding drifts again), and µs arithmetic matches
  * DuckDB INTERVAL comparisons exactly — no whole-second truncation that
  * would shift range-frame boundaries.
  */
object Events {

  private val HourUs = 3600L * 1000000L
  private val HalfHourUs = 1800L * 1000000L

  /** q15: equi + theta (interval) self-join — click→purchase conversions
    * within 30 minutes. Executes as a join on the user_id equi key with
    * the interval condition as a post-filter; at scale the equi key keeps
    * the shuffle bounded (never a pure range join). */
  def q15JoinRangeTheta(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("u1"), col("ts").as("t1"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("t2"))
    clicks.join(purchases,
        col("u1") === col("u2") &&
        col("t2") > col("t1") &&
        col("t2") <= col("t1") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("u1").as("user_id"))
      .agg(count(lit(1)).as("conversions"))
      .orderBy("user_id")
  }

  /** q16: as-of join — last click at-or-before each purchase, per user.
    * Spark has no native ASOF, so: union-tag both sides, per-user window
    * ordered by (ts, tag) with clicks (tag 0) before purchases (tag 1) on
    * equal ts, carry `last(click_id, ignoreNulls)` forward, keep purchase
    * rows. One shuffle + one sort — same cost shape as a native as-of
    * merge, and it scales: state per user is a single running value. */
  def q16JoinAsof(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
              col("event_id").as("click_id"), lit(null).cast("long").as("purchase_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
              lit(null).cast("long").as("click_id"), col("event_id").as("purchase_id"))
    // The original event_id (whichever side's column carries it)
    // completes the total order: with only (ts, tag), two clicks
    // sharing a timestamp would make last(click_id)
    // partition-order-dependent. The testdata has no (user, ts) ties
    // (SURVEY §2.3), so this cannot change oracle agreement — it removes
    // the latent nondeterminism if ties ever appear.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("tag"), coalesce(col("click_id"), col("purchase_id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("purchase_id"), col("last_click_id"))
      .orderBy("purchase_id")
  }

  /** q18: running aggregate (ROWS unbounded-preceding frame). The running
    * sum is evaluated sequentially in frame order on both engines, so
    * plain double addition is already deterministic here. */
  def q18WinRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
              dround(sum(col("value")).over(w), 2).as("cum_value"))
      .orderBy("user_id", "event_id")
  }

  /** q19: lead/lag analytics with default value. */
  def q19WinLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"),
              lag(col("event_type"), 1).over(w).as("prev_type"),
              lead(col("event_type"), 1).over(w).as("next_type"),
              dround(col("value") - lag(col("value"), 1, 0.0).over(w), 2).as("delta"))
      .orderBy("user_id", "event_id")
  }

  /** q20: RANGE frame over event time — events per user in the trailing
    * hour. Spark range frames are numeric, so order by `unix_micros(ts)`
    * with a [-1h, 0] µs frame: exact equivalent of DuckDB's
    * `RANGE INTERVAL 1 HOUR PRECEDING` (µs precision, no truncation). */
  def q20WinRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts").cast("timestamp")))
      .rangeBetween(-HourUs, 0)
    events(s, d)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
              count(lit(1)).over(w).as("n_last_hour"))
      .orderBy("user_id", "event_id")
  }

  /** q30: tumbling 1h event-time window — `window()` works identically in
    * batch and streaming; emit window.start for a flat schema. */
  def q30TumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumRound(col("value"), 2).as("sv"))
      .select(col("window.start").as("win"), col("event_type"), col("n"), col("sv"))
      .orderBy("win", "event_type")

  /** q31: sliding 1h window, 15-minute slide — each event lands in 4
    * windows; Spark expands then aggregates (map-side partial agg keeps
    * the 4× expansion local). */
  def q31SlidingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsumRound(col("value"), 2).as("sv"))
      .select(col("window.start").as("win_start"), col("n"), col("sv"))
      .orderBy("win_start")

  /** q32: session windows (30-minute gap) in the canonical lag→flag→
    * cumulative-sum formulation — the *definition* of a session window,
    * and the exact shape the oracle uses so labels match. Streaming twin:
    * `session_window($"ts", "30 minutes")` (graft.streaming). */
  def q32SessionWindow(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // event_id tie-break mirrors wOrd: a ROWS-frame running sum over a
    // tie-ambiguous order would make sess_id assignment depend on
    // partition order when (user, ts) repeats. No ties exist in the
    // testdata, so oracle agreement is unchanged.
    val wCum = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             (unix_micros(col("ts").cast("timestamp")) - unix_micros(col("prev_ts").cast("timestamp")) > HalfHourUs), 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(wCum).cast("long"))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("sess_start"),
           max(col("ts")).as("sess_end"),
           dsumRound(col("value"), 2).as("sv"))
      .orderBy("user_id", "sess_id")
  }

  /** q33: keep-first dedup — NOT dropDuplicates, which keeps an
    * arbitrary row and can't hash-match an oracle. The keeper per key is
    * the argmin by (ts, event_id), computed as `min(struct(ts,
    * event_id))` (struct ordering is lexicographic). Struct-valued
    * buffers plan as SortAggregate (partition-local sort by the GROUP
    * key), but the partial aggregate still combines map-side — only one
    * row per (key, partition) crosses the shuffle, where the equivalent
    * row_number()-window formulation shuffles EVERY event and sorts by
    * the full (key, ts, event_id) ordering. At 100 TB the shuffle-volume
    * difference dominates. Streaming twin: dropDuplicatesWithinWatermark. */
  def q33DedupKeepFirst(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("event_type"),
              col("m.event_id").as("event_id"), col("m.ts").as("ts"))
      .orderBy("user_id", "event_type")

  /** q40: numeric histogram — floor-bucket aggregation. */
  def q40Histogram(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(floor(col("value") / 5).as("bucket"))
      .agg(count(lit(1)).as("n"), davg(col("value"), 4).as("avg_v"))
      .orderBy("bucket")
}
