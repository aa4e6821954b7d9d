package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY.md §2.12).
  *
  * Double sums are order-dependent; Spark's partial/final aggregation
  * order varies with partitioning, so a plain `sum(double)` can differ
  * run-to-run and engine-to-engine by ~1e-6 relative — enough to flip a
  * `round(x, 2)` at a boundary. Decimal addition is associative, so
  * summing through `DECIMAL(38,8)` makes the aggregate exact and
  * order-independent regardless of how many shuffle partitions / AQE
  * stages the plan has. This also holds at 1000-executor scale: the
  * guarantee comes from the type, not the schedule.
  */
object Determinism {
  /** Order-independent exact sum of a double measure. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 8)))

  /** Exact sum, rounded to `scale` and returned as DOUBLE for schema
    * parity with DuckDB's `round(sum(x), scale)`. Rounds via `dround`
    * (the DuckDB floor formula): Spark's builtin `round` disagrees with
    * it when the exact decimal sum lands on a half-way boundary (e.g.
    * an exact ….6250 at scale 2), which cent-valued inputs can hit. */
  def dsumRound(c: Column, scale: Int): Column =
    dround(dsum(c).cast("double"), scale)

  /** Deterministic average: exact decimal numerator, double division,
    * rounded — mirrors `round(avg(x), scale)` on the oracle side.
    * Divides by `count(c)` (non-null rows), matching SQL avg() null
    * semantics even when the measure column contains NULLs. */
  def davg(c: Column, scale: Int): Column =
    dround(dsum(c).cast("double") / count(c), scale)

  /** DuckDB-exact rounding of a DOUBLE: `floor(x*10^s + 0.5) / 10^s`
    * (half away from zero on the scaled double, including its IEEE
    * quirks — e.g. 2.675 → 2.68 because 267.4999… + 0.5 rounds up to
    * 268.0 in binary). Spark's builtin `round` instead rounds the
    * shortest decimal representation via BigDecimal, which disagrees at
    * half-way boundaries (8202.84499… → 8202.85 vs DuckDB's 8202.84).
    * Every declared double-valued `round` goes through this so both
    * engines perform bit-identical IEEE ops. */
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale) // exact in double for scale <= 15
    val scaled = c * lit(p)
    (when(scaled >= 0, floor(scaled + lit(0.5)))
      .otherwise(-floor(-scaled + lit(0.5)))
      .cast("double") / lit(p))
  }
}
