package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Determinism._
import Tables._

/** Analytics query surface (q51+): the reporting/statistics shapes a
  * warehouse user runs daily — moment statistics, pivots, exact
  * percentiles, cohort retention, funnels — plus two more text-pipeline
  * queries (bigram frequency, n-gram decontamination overlap) that ARE
  * SQL-expressible and therefore carry full DuckDB oracles, unlike their
  * seeded-LSH cousins in [[Extended]].
  *
  * Cross-engine determinism notes (every query here hash-matches):
  *   - Double sums are order-dependent, so every second-moment statistic
  *     (variance/covariance/correlation) is computed from EXACT decimal
  *     sums (2-decimal inputs → DECIMAL(18,2) casts multiply to exact
  *     DECIMAL products, summed exactly), then combined in double with
  *     the IDENTICAL expression tree on both engines — same IEEE ops in
  *     the same order → bit-identical before the final rounding.
  *   - Rounding is [[Determinism.dround]] on the Spark side and its
  *     spelled-out floor form in the oracle SQL (sign-aware CASE where
  *     the value can be negative, e.g. correlation).
  */
object Analytics {

  /** q51: grouped moment statistics — count, mean, sample variance /
    * stddev of price, and price↔quantity sample covariance and Pearson
    * correlation, all derived from exact decimal power sums (see object
    * Scaladoc). The 100 TB shape: one map-side-combinable aggregate pass
    * producing six sums per group; the moments are O(groups) arithmetic
    * after the shuffle. */
  def q51StatsMoments(s: SparkSession, d: String): DataFrame = {
    val pd = col("l_extendedprice").cast(DecimalType(18, 2))
    val qd = col("l_quantity").cast(DecimalType(18, 2))
    val sums = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
           sum(pd).as("sp"), sum(qd).as("sq"),
           sum(pd * pd).as("spp"), sum(qd * qd).as("sqq"),
           sum(pd * qd).as("spq"))
    val nd = col("n").cast("double")
    val sp = col("sp").cast("double")
    val sq = col("sq").cast("double")
    val spp = col("spp").cast("double")
    val sqq = col("sqq").cast("double")
    val spq = col("spq").cast("double")
    val varP = (spp - sp * sp / nd) / (nd - lit(1.0))
    sums.select(
        col("l_returnflag"), col("l_linestatus"), col("n"),
        dround(sp / nd, 4).as("avg_price"),
        dround(varP, 4).as("var_price"),
        dround(sqrt(varP), 4).as("std_price"),
        dround((spq - sp * sq / nd) / (nd - lit(1.0)), 4).as("covar_pq"),
        dround((nd * spq - sp * sq) /
               (sqrt(nd * spp - sp * sp) * sqrt(nd * sqq - sq * sq)), 6)
          .as("corr_pq"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q52: pivot — order count and revenue per order-year, one column
    * pair per order status (`groupBy.pivot` with explicit values, so the
    * plan is a single aggregate with no value-discovery pre-pass; the
    * oracle is the equivalent FILTERed conditional aggregation).
    * Counts are coalesced to 0 so an absent (year, status) cell matches
    * the oracle's empty FILTER count. */
  def q52PivotStatus(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"),
           dsumRound(col("o_totalprice"), 2).as("rev"))
      .select(col("yr"),
              coalesce(col("F_cnt"), lit(0L)).as("f_cnt"), col("F_rev").as("f_rev"),
              coalesce(col("O_cnt"), lit(0L)).as("o_cnt"), col("O_rev").as("o_rev"),
              coalesce(col("P_cnt"), lit(0L)).as("p_cnt"), col("P_rev").as("p_rev"))
      .orderBy("yr")

  /** q53: exact percentiles per group — min / p25 / p50 / p75 / max of
    * order totals by priority via the exact `percentile` aggregate
    * (linear interpolation at rank p·(n−1), the same definition as the
    * oracle's `quantile_cont`). Interpolated values of 2-decimal inputs
    * at quarter fractions carry at most 4 decimals, so the dround(4) is
    * exact on both engines. Exact percentile buffers the group's values;
    * the approx_percentile sketch (capability row, Approx.scala) is the
    * 100 TB path. */
  def q53PercentilePrice(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           min("o_totalprice").as("mn"),
           dround(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
           dround(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
           dround(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"),
           max("o_totalprice").as("mx"))
      .orderBy("o_orderpriority")

  /** q54: cohort retention — users bucketed by the DAY of their first
    * event (cohort), then distinct-user counts per (cohort day, day
    * offset). Day grain, not week: the events table spans one month, so
    * weekly cohorts collapse to a single row while daily cohorts give
    * the full triangular retention matrix. All-integral arithmetic
    * (DATE truncation + day differences). Scale shape: self-join on
    * user_id (shuffle on the join key), then a distinct-aggregate on
    * the coarse (day, offset) grid. */
  def q54CohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val firsts = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
    ev.join(firsts, "user_id")
      .select(col("user_id"), to_date(col("first_ts")).as("cohort_day"),
              datediff(to_date(col("ts")), to_date(col("first_ts"))).as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q55: funnel conversion — per-user first timestamp of each stage
    * (signup → view → purchase), then one row of strictly-ordered stage
    * counts. All counts of exact timestamp comparisons; no floats. */
  def q55FunnelStages(s: SparkSession, d: String): DataFrame = {
    val firstOf = (t: String) =>
      min(when(col("event_type") === t, col("ts")))
    events(s, d)
      .groupBy("user_id")
      .agg(firstOf("signup").as("ts_s"),
           firstOf("view").as("ts_v"),
           firstOf("purchase").as("ts_p"))
      .agg(count(lit(1)).as("n_users"),
           count(col("ts_s")).as("n_signup"),
           count(when(col("ts_v") > col("ts_s"), 1)).as("n_view_after"),
           count(when(col("ts_p") > col("ts_v") && col("ts_v") > col("ts_s"), 1))
             .as("n_full_funnel"))
  }

  /** q56: top-N bigram frequency — q39's wordcount extended to adjacent
    * token pairs. The pair array is built scan-side with zip_with over
    * two slices of the token array (no self-join, no window): pairs
    * spanning an empty token (double spaces) are dropped, mirroring the
    * oracle's position self-join with both-nonempty filter. */
  def q56BigramTopn(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """filter(
          |  zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),
          |           (x, y) -> CASE WHEN x <> '' AND y <> '' THEN concat(x, ' ', y) END),
          |  p -> p IS NOT NULL)""".stripMargin)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** q57: decontamination overlap report — the measurement twin of the
    * capability-layer [[graft.operators.Approx.ngramContamination]]: docs
    * 0–19 act as the held-out benchmark, and every other document gets
    * its 8-gram shingle count, benchmark-hit count, hit ratio, and a
    * contaminated flag. The benchmark shingle set is broadcast (it is
    * small by construction — benchmarks are, even at 100 TB corpus
    * scale), so the corpus side stays scan-local: shingle, hash-probe,
    * aggregate per doc. */
  def q57DecontamOverlap(s: SparkSession, d: String): DataFrame = {
    // Round 17: the >= 8-token guard lives INSIDE the generator (docs
    // under 8 tokens explode an empty array and vanish — exactly the
    // rows the old `.filter(size(toks) >= 8)` dropped). As a user
    // filter, predicate pushdown substituted the `toks` alias and every
    // document paid `split(text)` twice: once in the pushed
    // size-filter, once in the projection (q57 before-plan nodes 3/4 +
    // 8/9). Now each side tokenizes once; the short-doc branch costs a
    // size() check. `slice(toks, 1, 0)` is the empty ARRAY<STRING>
    // (array() alone would need a cast from ARRAY<VOID>).
    val sh = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(toks) >= 8 THEN " +
        "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' ')) " +
        "ELSE slice(toks, 1, 0) END"))
        .as("sh"))
    val bench = sh.filter(col("doc_id") < 20).select(col("sh").as("bsh")).distinct()
    sh.filter(col("doc_id") >= 20)
      .join(broadcast(bench), col("sh") === col("bsh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("bsh")).as("n_hits"))
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
              dround(col("n_hits").cast("double") / col("n_shingles").cast("double"), 4)
                .as("ratio"),
              (col("n_hits") > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** q61: blocked fuzzy join (record linkage / entity resolution): part
    * pairs within the same brand whose names differ but sit within
    * Levenshtein distance 2 — the standard blocking-then-compare shape.
    * The block key makes the quadratic comparison tractable: the join
    * shuffles both sides on p_brand so each block compares locally, and
    * the edit-distance only runs inside blocks (n²/|blocks| vs n²
    * comparisons). At 100 TB the block key is the dial — a coarse key
    * (25 brands here) means few, large, skew-prone blocks; production
    * linkage picks finer keys (brand × length bucket) or salts hot
    * blocks (Approx.saltedJoin). levenshtein() is a codegen'd builtin
    * in both engines with identical unit-cost edit semantics.
    *
    * Two value-preserving cuts keep the in-block comparison cheap:
    * (1) a length-difference prefilter — edit distance is bounded below
    * by ||a|−|b||, so pairs further than 2 apart in length can never
    * qualify and skip the edit computation entirely; (2) the
    * threshold form `levenshtein(a, b, 2)`, which runs the banded
    * O(k·n) algorithm and returns −1 past the bound instead of filling
    * the full O(n²) matrix — for qualifying pairs it returns the exact
    * distance, so emitted values are identical to the unbounded form
    * (and to the oracle, which DuckDB evaluates unbounded). */
  def q61FuzzyJoin(s: SparkSession, d: String): DataFrame = {
    // The in-block quadratic compare is the whole cost, so the block join
    // must run at full parallelism: a session tuned for small aggregates
    // (the bench's 4 shuffle partitions) would pile ~6 brand blocks'
    // pair loops onto each of 4 tasks. Repartitioning the shared scan by
    // the block key ONCE (both join sides reuse the exchange, and the
    // alias-aware projections keep the partitioning recognized — no
    // re-shuffle at the join) spreads the blocks across min(|blocks|,
    // parallelism) tasks; parallelism beyond the 25 brands needs a finer
    // key or salting, per the blocking dial note above.
    val blockParts = math.max(s.sessionState.conf.numShufflePartitions,
                              s.sparkContext.defaultParallelism)
    val blocked = part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .repartition(blockParts, col("p_brand"))
    val x = blocked.select(col("p_partkey").as("a"), col("p_brand").as("brand"),
                           col("p_name").as("name_a"))
    val y = blocked.select(col("p_partkey").as("b"), col("p_brand").as("brand"),
                           col("p_name").as("name_b"))
    x.join(y, Seq("brand"))
      .filter(col("a") < col("b") && col("name_a") =!= col("name_b") &&
              abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .select(col("a"), col("b"), col("name_a"), col("name_b"),
              levenshtein(col("name_a"), col("name_b"), 2).cast("long").as("dist"))
      .filter(col("dist") >= 0)
      .orderBy("a", "b")
  }

  /** q65: conversion-latency analytics — for every purchase, the time
    * since the same user's most recent view within the preceding 30
    * minutes (the attribution window), aggregated to daily median/p90
    * latency. Combines the as-of shape (max prior event per anchor —
    * q16's family, bounded so the join stays an interval band) with
    * q53's exact-percentile parity; latencies are exact µs integers
    * (unix_micros ≡ epoch_us under the UTC session), so the only
    * floating-point is the final interpolation + seconds division,
    * dround(·,4)-ed identically on both engines. Scale shape: shuffle
    * both event slices on user_id, per-purchase max inside the band,
    * then an O(days) aggregate. */
  def q65ConversionLatency(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val lat = p.join(v, Seq("user_id"))
      .filter(col("v_ts") <= col("p_ts") &&
              col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .groupBy(col("purchase_id"), col("p_ts"))
      .agg(max(col("v_ts")).as("v_ts"))
      .select(col("p_ts"),
              (unix_micros(col("p_ts").cast("timestamp")) -
               unix_micros(col("v_ts").cast("timestamp"))).as("lat_us"))
    lat.groupBy(to_date(col("p_ts")).as("day"))
      .agg(count(lit(1)).as("n_conv"),
           dround(percentile(col("lat_us"), lit(0.5)) / 1000000.0, 4).as("p50_s"),
           dround(percentile(col("lat_us"), lit(0.9)) / 1000000.0, 4).as("p90_s"))
      .orderBy("day")
  }

  /** q63: per-group z-score outlier detection — events whose value sits
    * ≥ 2.5 sample standard deviations from their event type's mean.
    * Group stats come from exact decimal power sums (q51's machinery:
    * DECIMAL casts make the sums order-independent, then both engines
    * combine them in double with the identical expression tree); the
    * z-score is dround(·,4)-ed BEFORE the threshold so the boundary
    * compare is on the same 4dp value in both engines. The 100 TB
    * shape: one map-side-combinable stats pass producing O(groups)
    * rows, broadcast back over a second scan — the z computation and
    * filter stay scan-local, no wide shuffle at all. */
  def q63OutlierZscore(s: SparkSession, d: String): DataFrame = {
    val vd = col("value").cast(DecimalType(18, 2))
    val stats = events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           sum(vd).cast("double").as("sp"),
           sum(vd * vd).cast("double").as("spp"))
    val zraw = (col("value") - col("sp") / col("n")) /
      sqrt((col("spp") - col("sp") * col("sp") / col("n")) / (col("n") - 1))
    events(s, d).join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
              dround(zraw, 4).as("z"))
      .filter(abs(col("z")) >= 2.5)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }
}
