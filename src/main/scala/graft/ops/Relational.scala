package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Determinism._
import Tables._

/** Relational operator family: scan/filter/project, predicates, joins of
  * every shape, aggregation (plain / distinct / rollup / cube / grouping
  * sets), ranking windows, sort/top-k, set ops, the scalar function
  * library, and the flagship star denormalization (SURVEY.md §2.1–§2.8,
  * §2.11).
  *
  * Every builder is a pure `(SparkSession, sfDir) => DataFrame` producing
  * a totally-ordered result (unique tie-break key) so the Verify dump is
  * byte-deterministic (SURVEY.md §2.12). All plans are declarative
  * DataFrame trees: predicate pushdown, column pruning, and broadcast
  * selection come from Catalyst — verified via `.explain("formatted")`.
  */
object Relational {

  /** q01: parquet scan + pushed predicate + derived column. The shipdate
    * range + flag predicates reach the parquet reader (row-group/page
    * skip at scale); only 6 of 11 lineitem columns are read. */
  def q01ScanFilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp_ntz") &&
              col("l_returnflag") === "R" && col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_linenumber"),
              dround(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))
      .orderBy("l_orderkey", "l_linenumber")

  /** q02: compound predicates — AND/OR/IN/BETWEEN/LIKE/IS NOT NULL/NOT. */
  def q02PredComplex(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter((col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") ||
               col("c_acctbal").between(1000, 2000)) &&
              col("c_name").like("Customer%") &&
              col("c_nationkey").isNotNull && !(col("c_acctbal") < 0))
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q03: multi-measure hash aggregation (TPC-H Q1 shape). Partial
    * (map-side) + final agg is automatic; sums go through DECIMAL(38,8)
    * for order-independence (Determinism.dsum). */
  def q03AggPricing(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsumRound(col("l_quantity"), 2).as("sum_qty"),
        dsumRound(col("l_extendedprice"), 2).as("sum_base"),
        dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc"),
        dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("sum_charge"),
        davg(col("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q04: distinct aggregation — planner handles the expand + two-phase agg. */
  def q04AggDistinct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
           countDistinct(col("o_orderpriority")).as("n_prio"),
           count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** q05: ROLLUP hierarchy region→nation; both dim joins broadcast.
    * The `.alias("b")` + qualified grouping columns sidestep Spark's
    * ambiguous-self-join false positive on rollup-after-join (the Expand
    * node re-tags the grouping attributes). */
  def q05AggRollup(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .alias("b")
      .rollup(col("b.r_name"), col("b.n_name"))
      .agg(count(lit(1)).as("n_cust"), dsumRound(col("b.c_acctbal"), 2).as("bal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** q06: CUBE over status × priority. */
  def q06AggCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsumRound(col("o_totalprice"), 2).as("tp"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** q07: GROUPING SETS (segment),(nation),(). */
  def q07AggGroupingSets(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey")), Seq.empty),
        col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("c_mktsegment"), asc_nulls_first("c_nationkey"))

  /** q08: equi inner join + agg. orders⋈customer shuffles on the key at
    * scale (or broadcasts customer when small) — left to AQE. */
  def q08JoinInner(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsumRound(col("o_totalprice"), 2).as("total"))
      .orderBy("c_mktsegment")

  /** q09: 3-way join + agg + top-N (TPC-H Q3 shape). Filters are pushed
    * below the joins; TakeOrderedAndProject avoids a full global sort. */
  def q09JoinMultiwayTopn(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1998-06-15").cast("timestamp_ntz"))
    val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-06-15").cast("timestamp_ntz"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q10: left outer join + null-skipping count / null-safe sum. */
  def q10JoinLeftOuter(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
           dround(coalesce(dsum(col("o_totalprice")).cast("double"), lit(0.0)), 2).as("spent"))
      .orderBy("c_custkey")

  /** q11: full outer join of two pre-aggregated sides. Aggregating BEFORE
    * the join keeps the outer join tiny (25 nations) at any scale. */
  def q11JoinFullOuter(s: SparkSession, d: String): DataFrame = {
    val cn = customer(s, d).groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
    val sn = supplier(s, d).groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("cnk") === col("snk"), "full")
      .select(coalesce(col("cnk"), col("snk")).as("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** q12: left semi join (EXISTS). */
  def q12JoinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q13: left anti join (NOT EXISTS). */
  def q13JoinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 450000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** q14: cross product (5 × 25 — the only intentional NLJ). */
  def q14JoinCross(s: SparkSession, d: String): DataFrame =
    region(s, d).crossJoin(nation(s, d))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** q17: ranking window family. rank/dense_rank/row_number/ntile return
    * INT in Spark, BIGINT in DuckDB → cast to LONG for schema parity
    * (SURVEY.md §2.12 rule 4). */
  def q17WinRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
              rank().over(w).cast("long").as("rnk"),
              dense_rank().over(w).cast("long").as("drnk"),
              row_number().over(w).cast("long").as("rn"),
              ntile(4).over(w).cast("long").as("quartile"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderpriority", "rn")
  }

  /** q21: global top-k → TakeOrderedAndProject (per-partition heaps, no
    * full range-partitioned sort — the right plan at any scale). */
  def q21SortTopk(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** q22: UNION ALL of distinct-projected branches. */
  def q22Union(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk")).distinct()
      .withColumn("kind", lit("cust"))
    val su = supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
      .withColumn("kind", lit("supp"))
    c.unionByName(su).orderBy("nk", "kind")
  }

  /** q23: INTERSECT + EXCEPT (set semantics), union-tagged. */
  def q23IntersectExcept(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("nk"))
    val su = supplier(s, d).select(col("s_nationkey").as("nk"))
    val both = c.intersect(su).withColumn("tag", lit("both"))
    val custOnly = c.except(su).withColumn("tag", lit("cust_only"))
    both.unionByName(custOnly).select("nk", "tag").orderBy("tag", "nk")
  }

  /** q24: string function library. length() is INT in Spark, BIGINT in
    * DuckDB → cast. */
  def q24StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
              upper(col("p_brand")).as("u"),
              lower(col("p_type")).as("l"),
              substring(col("p_name"), 1, 8).as("pre"),
              expr("replace(p_type, ' ', '_')").as("rep"),
              length(col("p_name")).cast("long").as("len"),
              concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
              trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
              when(col("p_type").like("%PROMO%"), 1).otherwise(0).as("is_brass"))
      .orderBy("p_partkey")

  /** q25: date/time library. year/month/day cast to INT on both sides
    * (DuckDB returns BIGINT). */
  def q25DateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
              year(col("o_orderdate")).cast("int").as("yr"),
              month(col("o_orderdate")).cast("int").as("mo"),
              dayofmonth(col("o_orderdate")).cast("int").as("dom"),
              date_trunc("month", col("o_orderdate")).cast("date").as("mstart"),
              (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"),
              datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("int").as("age_days"))
      .orderBy("o_orderkey")

  /** q26: math library. ceil/floor are LONG in Spark, DOUBLE in DuckDB →
    * cast to double; `ab` stays DOUBLE end-to-end: a DECIMAL output
    * column survives the parquet dump as Python Decimal objects while
    * DuckDB's pandas bridge yields float64, so the driver's value-hash
    * compare diverges on types even when the numbers agree (the r01/r02
    * q26 hash failure).
    *
    * Transcendentals (`lg`, `pw`) are cast to FLOAT on both sides
    * instead of rounded: ln/pow are libm calls whose last double ulp is
    * implementation-defined (JVM intrinsic vs whichever libm the
    * oracle's DuckDB build links), and a 1-ulp difference can flip any
    * decimal rounding at a boundary. Rounding to nearest float32
    * quantizes 2^29× coarser than the drift, which in practice absorbs
    * it — strictly, a double within ~1 ulp of a float32 rounding
    * midpoint could still round either way, so the guarantee is
    * probabilistic (~2^-29 per value), not absolute; if q26 ever
    * mismatches on a single value, check this first. sqrt stays
    * exact-rounded per IEEE 754 and needs no armor. */
  def q26MathFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_linenumber"),
              dround(col("l_extendedprice"), 1).as("r1"),
              dround(abs(col("l_discount") - 0.05), 4).as("ab"),
              ceil(col("l_quantity")).cast("double").as("c"),
              floor(col("l_quantity")).cast("double").as("f"),
              dround(sqrt(col("l_extendedprice")), 4).as("sq"),
              log(col("l_extendedprice") + 1).cast("float").as("lg"),
              pow(lit(1) + col("l_discount"), 2).cast("float").as("pw"),
              (col("l_orderkey") % 7).cast("long").as("md"))
      .orderBy("l_orderkey")

  /** q27: CASE-WHEN bucketing + coalesce(nullif(...)). */
  def q27CaseNull(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
              when(col("c_acctbal") < 0, "neg")
                .when(col("c_acctbal") < 5000, "low")
                .otherwise("high").as("bucket"),
              coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg"))
      .orderBy("c_custkey")

  /** q38: flagship star denormalization — lineitem fact joined to all six
    * dimension tables, 12 wide columns (the "snapshot → relational mart"
    * ETL shape, SURVEY.md §2.11). The five small dims broadcast; the
    * fact⋈orders join shuffles on the order key. At 100 TB the same plan
    * holds: dims stay broadcast-able, the fact-side shuffle is the one
    * unavoidable exchange, and date-partitioned input prunes scans. */
  def q38StarDenorm(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"), col("o_orderstatus"),
              col("c_name"), col("c_mktsegment"),
              col("n_name").as("cust_nation"), col("r_name").as("cust_region"),
              col("p_name"), col("p_brand"), col("s_name"),
              dround(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net"))
      .orderBy("l_orderkey", "l_linenumber")
}
