package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{IncrementalAgg, PageRank, ZOrder}

/** Core relational operator surface (SURVEY.md §2b: scans, filter/project,
  * joins of every type, hash aggregates, count-distinct, rollup/cube/
  * grouping sets, window functions, sort/limit/top-k, set ops).
  *
  * The reference has no relational layer (S4 is a stream shipper,
  * SURVEY.md §1); these queries exist because the driver's correctness
  * gate verifies a relational surface against DuckDB over the fixture
  * star schema.
  *
  * Determinism rules (oracle hash-compares): every query ends in a total
  * ORDER BY; timestamps are projected to epoch microseconds
  * (`unix_micros` ≡ DuckDB `epoch_us`) to dodge ns-vs-µs parquet type
  * drift. Doubles follow one rule: AGGREGATES are `round(...)`-ed
  * identically on both sides (accumulation order drifts between
  * engines), but PER-ROW arithmetic and direct column projections are
  * emitted RAW — identical operands through identical IEEE ops are
  * bit-identical across engines, while rounding them is what INTRODUCES
  * divergence (Spark rounds the shortest decimal repr HALF_UP, DuckDB
  * rounds binary*10^k — they disagree on decimal-halfway products like
  * 98985.725, observed at sf0.1).
  *
  * Scale notes: dimension tables (region/nation/supplier/customer/part)
  * are explicitly `broadcast()`-hinted in star joins — at 100 TB the fact
  * tables shuffle only when the grouping key demands it; filters are plain
  * column predicates so parquet pushdown applies.
  */
object Relational {

  private def ts(s: String) = to_timestamp(lit(s))

  /** TPC-H Q1-style pricing summary: scan → filter → hash agg (partial+final). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + project: predicates push to parquet, per-row computed column. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1996-12-31"))
        && col("l_discount").between(0.02, 0.06)
        && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q3-style shipping priority: 3-way join, agg, top-k on revenue. */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1997-01-01"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1997-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        // o_orderdate loads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.
        // Session tz is UTC so the cast is lossless.
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Semi join (EXISTS): orders with at least one returned lineitem. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q5-style star join: fact tables shuffle-join on their keys,
    * all dims broadcast (no shuffle for the dimension side at any scale). */
  def q05LocalSupplier(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))

  /** TPC-H Q6-style single-row agg; all predicates pushed to the scan. */
  def q06RevenueForecast(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1996-12-31"))
        && col("l_discount").between(0.02, 0.09)
        && col("l_quantity") < 25)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** Anti join (NOT EXISTS): customers that never ordered. */
  def q07CustNoOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_mktsegment"))

  /** Exact count-distinct (expand+two-phase agg under the hood). */
  def q08DistinctParts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Window ranking: top-3 orders per market segment, computed TWO-PHASE
    * because the group key has ~5 values — a single window partitioned by
    * it means 5 tasks each sorting a fifth of the joined fact table at
    * scale. Phase 1 takes a salted local top-3 (64 sub-partitions per
    * segment, each sorting n/320 rows); phase 2 ranks the surviving
    * 64*3 rows per segment. Identical output to the single-window form:
    * the true global top-3 of a segment are necessarily each a top-3 of
    * their salt sub-partition. */
  def q09TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val local = Window.partitionBy(col("c_mktsegment"), col("_salt")).orderBy(order: _*)
    val global = Window.partitionBy(col("c_mktsegment")).orderBy(order: _*)
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .withColumn("_salt", pmod(hash(col("o_orderkey")), lit(64)))
      .withColumn("_lrn", row_number().over(local))
      .filter(col("_lrn") <= k)
      .withColumn("rn", row_number().over(global))
      .filter(col("rn") <= k)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
        col("o_totalprice").as("totalprice"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** ROLLUP over two grouping columns; nulls replaced by a sentinel so the
    * oracle compare never depends on engine null-ordering. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE over order status/priority. */
  def q11Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("total"), col("n"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  /** GROUPING SETS via the Spark 4 Dataset API (no session-global temp
    * view registered as a side effect — VERDICT r3 hygiene). */
  def q12GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("total_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("total_price"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Running sum over an ordered per-key frame (sequential adds — bitwise
    * reproducible across engines, unlike unordered sums). */
  def q13RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("running_value", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("running_value"))
      .orderBy(col("event_id"))
  }

  /** lag/lead analytics: inter-event gap per user in microseconds. */
  def q14LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"),
        col("next_type"))
      .orderBy(col("event_id"))
  }

  /** INTERSECT: customers with >2500 balance that actually ordered. */
  def q15Intersect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      .intersect(Tables.customer(s, dir).filter(col("c_acctbal") > 2500)
        .select(col("c_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** EXCEPT: customer keys that never appear in orders. */
  def q16Except(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      .except(Tables.orders(s, dir).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** Equi + range (theta) join: lineitem quantity within ±2 of part size. */
  def q17RangeJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey")
          && col("l_quantity").between(col("p_size") - 2, col("p_size") + 2))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_matches"), round(sum(col("l_extendedprice")), 2).as("total_price"))
      .orderBy(col("p_brand"))

  /** Cross join (small×small → BroadcastNestedLoop). */
  def q18CrossJoin(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(broadcast(Tables.nation(s, dir)))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** Global sort + limit (planner emits TakeOrderedAndProject — no full
    * sort of the table even at scale). */
  def q19SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))

  /** Approximate count-distinct (HLL++). Not oracle-comparable with DuckDB
    * (different sketch) — driver records a rows-only check. */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag"))

  /** Correlated scalar subquery (decorrelated by Catalyst into a join):
    * orders above their customer's average order value. */
  def q21AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir).groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("avg_price"))
    Tables.orders(s, dir)
      .join(perCust, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** LEFT OUTER join with null-producing aggregation: every customer,
    * including the never-ordered (their agg inputs are all-null and
    * coalesced to 0 so the oracle compare is null-free). */
  def q22LeftJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))

  /** FULL OUTER join: per-nation high-balance supplier counts vs
    * high-balance customer counts — thresholds chosen so each side has
    * nations the other lacks (real null-producing rows both ways). */
  def q23FullOuter(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir).filter(col("s_acctbal") > 8000)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    val cust = Tables.customer(s, dir).filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    sup.join(cust, col("s_nationkey") === col("c_nationkey"), "full_outer")
      .select(
        coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
      .orderBy(col("nationkey"))
  }

  /** UNION ALL (R2 fan-in semantics): two filtered entity streams merged
    * with a side tag. */
  def q24Union(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("entity_key"), lit("customer").as("side"))
      .unionByName(
        Tables.supplier(s, dir).filter(col("s_acctbal") > 9000)
          .select(col("s_suppkey").as("entity_key"), lit("supplier").as("side")))
      .orderBy(col("side"), col("entity_key"))

  /** Sliding event-time window (10 min length, 5 min slide): each event
    * lands in exactly two windows — the streaming-§2b op in its
    * batch-verifiable form. */
  def q25SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n_records"), countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_records"), col("n_users"))
      .orderBy(col("window_start_us"))

  /** Session window per user (30-minute gap): sessionization, the
    * other streaming-§2b window op, batch-verified via the SQL
    * gaps-and-islands equivalent. */
  def q26SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** The full ranking-function family (rank / dense_rank / ntile /
    * percent_rank beside q09's row_number) over a deterministic total
    * order. */
  def q27RankFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("prank"))
      .filter(col("rnk") <= 8)
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  /** Exact percentiles (sort-based `percentile`, linear interpolation —
    * same definition as the oracle's quantile_cont). */
  def q28Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** first_value / last_value analytics over an unbounded frame: each
    * user's first and most recent event type. */
  def q29FirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** RIGHT OUTER join with null-producing aggregation (closes the §2b
    * inner/left/RIGHT/full matrix): urgent orders right-joined to every
    * customer — customers with no urgent orders aggregate all-null order
    * columns (count 0, max coalesced). The preserved side is the big one;
    * the filtered stream side stays broadcastable at scale. */
  def q30RightOuter(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(count(col("o_orderkey")).as("n_urgent"),
        round(coalesce(max(col("o_totalprice")), lit(0.0)), 2).as("max_urgent_price"))
      .orderBy(col("c_custkey"))

  /** Approximate percentile sketch (Greenwald-Khanna) beside q28's exact
    * percentiles — the §2b sketch family's quantile member. Engine-only:
    * DuckDB's approx_quantile is a different sketch (t-digest), so the
    * driver records rows-only and SketchSpec gates the error against the
    * exact answer instead. */
  def q31ApproxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 2).as("p50_approx"),
        round(expr("approx_percentile(o_totalprice, 0.9, 1000)"), 2).as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** The salted skew join as an ORACLE-VERIFIED query (SkewJoinSpec
    * already proves plan-level equality; this holds the full operator to
    * a DuckDB plain-join oracle on real data): purchases enriched with a
    * per-user event-count dimension through SkewJoin.saltedEquiJoin —
    * the (key, salt) fan-out must be invisible in the result. */
  def q32SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user_events"))
    graft.operators.SkewJoin.saltedEquiJoin(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id")),
        dim, "user_id", saltSource = "event_id", salts = 8)
      .select(col("event_id"), col("user_id"), col("n_user_events"))
      .orderBy(col("event_id"))
  }

  /** PIVOT: long-to-wide conditional aggregation (`groupBy.pivot.agg`).
    * Explicit value list (`Seq("f","o")`) keeps the plan a single pass —
    * with no list Spark first collects distinct pivot values to the
    * driver, an extra job that at 100 TB scans the fact table twice.
    * Absent cells surface as null from PivotFirst; both sides coalesce
    * them to 0 so the oracle compare is well-defined. Pivot values are
    * lowercased because the generated column NAMES embed them and the
    * oracle compare is name-sensitive. */
  def q33Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("_ls", lower(col("l_linestatus")))
      .groupBy(col("l_returnflag"))
      .pivot("_ls", Seq("f", "o"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        coalesce(col("f_qty"), lit(0.0)).as("f_qty"),
        coalesce(col("f_n"), lit(0L)).as("f_n"),
        coalesce(col("o_qty"), lit(0.0)).as("o_qty"),
        coalesce(col("o_n"), lit(0L)).as("o_n"))
      .orderBy(col("l_returnflag"))

  /** UNPIVOT (melt): wide-to-long without a shuffle — `unpivot` is a
    * per-row Expand, so it pipelines inside the scan stage; only the
    * final presentation sort exchanges. Value columns must share a type,
    * hence the int→double cast on p_size. */
  def q34Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("double").as("p_size"))
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_retailprice"), col("p_size")),
        "metric", "val")
      .orderBy(col("p_partkey"), col("metric"))

  /** LATERAL correlated subquery (per-row dependent subquery — the
    * third member of the correlation family beside q21's scalar
    * subquery and q04/q07's semi/anti): top supplier per nation via a
    * correlated ordered-limit subquery. Catalyst decorrelates this into
    * a ranked join — same physical shape as q09's window top-k — so
    * "lateral" costs nothing extra at scale. Tables are referenced as
    * `parquet.`path`` inline so no session-global temp view is
    * registered (r3 hygiene rule). */
  def q35Lateral(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT n.n_name, t.s_name, t.s_acctbal
         |FROM parquet.`$dir/nation.parquet` n,
         |LATERAL (SELECT s_name, s_acctbal
         |         FROM parquet.`$dir/supplier.parquet` s
         |         WHERE s.s_nationkey = n.n_nationkey
         |         ORDER BY s_acctbal DESC, s_name LIMIT 1) t
         |ORDER BY n.n_name""".stripMargin)

  /** RANGE-frame window (value-based frame, vs q13's ROWS frame): per
    * user, events and cents-sum in the TRAILING HOUR of each event —
    * peers at the same timestamp share a frame, which ROWS can't
    * express. The summed quantity is an integer (floor(value*100)) so
    * the frame aggregation is immune to FP accumulation order, which a
    * RANGE frame does not fix (unlike a running ROWS sum, its adds are
    * not sequential-prefix). */
  def q36RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum(col("cents")).over(w))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("cents_1h"))
      .orderBy(col("event_id"))
  }

  /** Gap-fill / resample: hourly event counts per type over the full
    * span, missing hours zero-filled — the densification step every
    * time-series pipeline needs. The hour grid comes from one global
    * min/max row expanded with `sequence` (grid size = span, bounded,
    * broadcast), cross-joined with the distinct types, then the sparse
    * counts LEFT-join onto it. */
  def q37GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("hour_ts", date_trunc("hour", col("ts")))
    val counts = ev.groupBy(col("event_type"), col("hour_ts"))
      .agg(count(lit(1)).as("n"))
    val hours = ev.agg(min(col("hour_ts")).as("h0"), max(col("hour_ts")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
        .as("hour_ts"))
    val grid = ev.select(col("event_type")).distinct().crossJoin(hours)
    grid.join(counts, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), unix_micros(col("hour_ts")).as("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("hour_us"))
  }

  /** LIKE predicates, json_tuple (generator form of JSON extraction),
    * and null-safe equality — §2b's predicate/JSON function rows that no
    * other query exercised: pattern filters, a JSON key that EXISTS and
    * one that's absent (json_tuple yields null, counted via `<=>`). */
  def q38LikeJsonTuple(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        json_tuple(col("props"), "k", "missing").as(Seq("_k", "_m")))
      .filter(col("event_type").like("p%") || col("event_type").like("%iew"))
      .withColumn("m_is_null", col("_m") <=> lit(null))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("_k").cast("long")).as("sum_k"),
        sum(when(col("m_is_null"), 1L).otherwise(0L)).as("n_m_null"))
      .orderBy(col("event_type"))

  /** DECIMAL aggregation — exact fixed-point money math (the TPC-H
    * price columns are DECIMAL in the spec; the fixture stores doubles,
    * so the cast itself is part of the operator under test). Sums of
    * DECIMAL(18,2) are exact in both engines — no FP accumulation-order
    * caveat — and both results are cast to DECIMAL(38,2) so the parquet
    * schemas agree (Spark widens sums to (28,2), DuckDB to (38,2)). */
  def q39DecimalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("p")).cast("decimal(38,2)").as("total_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** BATCH sessionization (the gaps-and-islands form): a session breaks
    * where the per-user inter-event gap exceeds 30 minutes; session id =
    * running count of breaks. Two stacked windows on the SAME
    * (partition, order) — Catalyst plans them in one Window operator
    * behind one exchange+sort, so this costs exactly what q13/q14 cost.
    * Complements q26's streaming session_window: same islands, computed
    * relationally over history instead of incrementally with state. */
  def q40Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("_gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("_brk",
        when(col("_gap_us").isNull || col("_gap_us") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("_brk")).over(run).cast("int"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** STRATIFIED exact sampling: exactly min(n, |group|) docs per source,
    * chosen by a deterministic pseudo-random order (multiplicative hash
    * of doc_id, tie-broken by id) — the "N examples per source" sampling
    * a mixture builder uses when rates (doc_sample_mix) are too coarse.
    * The ranking window partitions by source, so it is distributed and
    * WindowGroupLimit-prunable — never a global sort. */
  def q41StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(pmod(col("doc_id") * lit(2654435761L) + lit(17), lit(1000000007L)),
        col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 10)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_sampled_id"),
        sum(col("doc_id")).cast("long").as("id_sum"))
      .orderBy(col("source"))
  }

  /** TPC-H Q8-style market share: one supplier nation's revenue fraction
    * within a customer region, by order year. The deep star join — fact
    * lineitem⋈orders shuffles on the order key, customer shuffles on the
    * cust key (at 100 TB customers don't broadcast), nation/region/
    * supplier are broadcast dims. Share = conditional sum / total sum in
    * ONE aggregate pass (no second scan or self-join). */
  def q42MarketShare(s: SparkSession, dir: String): DataFrame = {
    // DECIMAL revenue: the sf0.1 audit caught q43's double-sum landing on
    // a half-cent boundary where the engines' accumulation orders round
    // apart; decimal sums are exact and order-free, the single fp divide
    // below is deterministic
    val rev = col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
    val custRegion = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("_snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
          / sum(rev).cast("double"), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9-style product-line profit by supplier nation and year:
    * broadcast the filtered part dim into the fact scan, broadcast
    * supplier/nation, shuffle only on the l_orderkey⋈o_orderkey fact-fact
    * join and the final (nation, year) aggregate. */
  def q43ProductProfit(s: SparkSession, dir: String): DataFrame = {
    // DECIMAL amount — see q42MarketShare: exact order-free sums, no
    // half-cent rounding divergence between engines
    val amount = col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("supp_nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(amount), 2).cast("double").as("profit"))
      .orderBy(col("supp_nation"), col("o_year"))
  }

  /** OHLC downsampling (open/high/low/close per type × hour): the
    * standard time-series resample for metrics and market data. One
    * hash aggregate — open/close are min_by/max_by over a zero-padded
    * (event-time, event-id) string key, so ties in event time cannot
    * make the pick nondeterministic on either engine (DuckDB's arg_min
    * has no composite ordering key; the padded string is the portable
    * total order). No window, no sort: partial aggregation does all the
    * work map-side, the classic 100×-safe downsample plan. */
  def evOhlc(s: SparkSession, dir: String): DataFrame = {
    val ord = format_string("%020d%010d", unix_micros(col("ts")), col("event_id"))
    Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** STRICT-ORDERED n-step funnel (view → click after it → purchase
    * after that): the windowFunnel-style sequence operator — each step
    * must occur AT OR AFTER the previous user's step, not merely exist.
    * Step k+1 is one user_id-keyed join against the step-k frame plus a
    * min-when aggregate (first qualifying event); a missing step nulls
    * through every later step by comparison-with-null semantics, so no
    * per-step filtering is needed. All joins shuffle on user_id — at
    * 100× the chain is k hash joins on the same key, which AQE plans
    * back-to-back without re-partitioning; nothing is per-event stateful
    * and no window sees a user's full history. */
  def evOrderedFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def typed(t: String, as: String) =
      ev.filter(col("event_type") === t).select(col("user_id"), col("ts").as(as))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val clicked = views.join(typed("click", "_c"), Seq("user_id"), "left")
      .groupBy(col("user_id"), col("v_ts"))
      .agg(min(when(col("_c") >= col("v_ts"), col("_c"))).as("c_ts"))
    val purchased = clicked.join(typed("purchase", "_p"), Seq("user_id"), "left")
      .groupBy(col("user_id"), col("v_ts"), col("c_ts"))
      .agg(min(when(col("_p") >= col("c_ts"), col("_p"))).as("p_ts"))
    purchased
      .groupBy(date_format(col("v_ts"), "yyyy-MM-dd").as("cohort_date"))
      .agg(count(lit(1)).as("n_viewed"),
        sum(when(col("c_ts").isNotNull, 1).otherwise(0)).cast("long").as("n_clicked"),
        sum(when(col("p_ts").isNotNull, 1).otherwise(0)).cast("long").as("n_purchased"))
      .orderBy(col("cohort_date"))
  }

  /** Funnel conversion (signup → purchase within 3 days): the event-
    * sequence recipe every product-analytics engine ships. Per user, the
    * FIRST signup and the first purchase at-or-after it; a conversion
    * is a purchase within the window. One shuffle on user_id does all
    * the per-user work; the per-day aggregate is broadcast-small. */
  def q44Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    signups.join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(when(col("p_ts") >= col("signup_ts"), col("p_ts"))).as("conv_ts"))
      .groupBy(date_format(col("signup_ts"), "yyyy-MM-dd").as("signup_date"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when(col("conv_ts") <= col("signup_ts") + expr("INTERVAL 3 DAYS"), 1)
          .otherwise(0)).cast("long").as("n_converted"))
      .orderBy(col("signup_date"))
  }

  /** Day-7 cohort retention: users grouped by first-seen date, counted
    * again if active exactly 7 days later — the other standard
    * product-analytics recipe. The (user, date) activity set is distinct
    * BEFORE the self-join, so a chatty user costs one row per active
    * day, never a row per event. */
  def q45Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
    // distinct column names on the probe side: both frames derive from
    // ev, so df("col") disambiguation would hit the self-join check
    val active = ev.distinct()
      .select(col("user_id").as("_au"), col("d").as("_ad"))
    firstSeen
      .join(active,
        col("_au") === col("user_id")
          && col("_ad") === date_add(col("cohort_d"), 7), "left")
      .groupBy(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_date"))
      .agg(count(lit(1)).as("n_users"),
        count(col("_au")).as("n_retained_d7"))
      .orderBy(col("cohort_date"))
  }

  /** Event-sequence trigram mining (the "user journey" pattern family:
    * which 3-step paths dominate — signup>view>purchase vs
    * view>view>view): per user, the time-ordered event-type sequence is
    * cut into consecutive trigrams; global top-20 by count.
    *
    * Scale shape: ONE user_id shuffle builds every per-user sequence
    * (collect_list bounded by per-user activity — the same per-entity
    * bound sessionize/retention already rely on); trigram counting is an
    * explode → partial-aggregated groupBy, and the top-20 is a
    * TakeOrdered, never a global sort. Determinism: within-user order is
    * (ts, event_id) — event_id is unique — and the top-20 boundary
    * breaks ties on the trigram string. */
  def evJourneyTrigrams(s: SparkSession, dir: String): DataFrame = {
    val seqs = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))
      .filter(size(col("types")) >= 3)
    seqs
      .select(explode(transform(sequence(lit(0), size(col("types")) - 3),
        i => concat_ws(">", slice(col("types"), i + 1, lit(3))))).as("trigram"))
      .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram")).limit(20)
  }

  /** Per-user consecutive transitions between `props.k` pages —
    * (src, dst) per adjacent event pair, the edge stream the graph
    * queries (PageRank, triangles, reachability) all start from. One
    * user-keyed window; self-loop handling is per-query. */
  private def kTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("src", lag(col("k"), 1).over(w))
      .filter(col("src").isNotNull)
      .select(col("src"), col("k").as("dst"))
  }

  /** Link-centrality ranking of the journey graph: per-user event
    * transitions between `props.k` pages form a weighted edge list, and
    * three damped PageRank rounds score each page — the crawl-budget /
    * training-mix prioritisation shape (rank domains by link mass, feed
    * the scores to the sampler). The operator is the generic iterative
    * join+agg in operators/PageRank.scala; the oracle unrolls the same
    * three rounds as CTEs, with the damping constants CAST to DOUBLE so
    * both engines run the identical IEEE arithmetic, and round(6)
    * absorbing summation-order noise. */
  def evPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = kTransitions(s, dir)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
    PageRank.run(edges, iters = 3, damping = 0.85)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("node"))
  }

  /** Column profiler (the ANALYZE-TABLE summary every engine ships):
    * per-column null count, distinct count, min/max and mean over
    * lineitem's numeric columns — one pass, one row out per column via a
    * stack/unpivot of per-column aggregates. At scale this is the same
    * single-scan multi-aggregate any stats collector runs. */
  def q46Profile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(s, dir)
    val agg = li.agg(
      count(lit(1)).as("_n"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        round(min(col(c)), 4).as(s"${c}_min"),
        round(max(col(c)), 4).as(s"${c}_max"),
        round(avg(col(c)), 4).as(s"${c}_mean"))): _*)
    val stacked = cols.map { c =>
      agg.select(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"${c}_nulls").as("n_nulls"), col(s"${c}_distinct").as("n_distinct"),
        col(s"${c}_min").as("min_val"), col(s"${c}_max").as("max_val"),
        col(s"${c}_mean").as("mean_val"))
    }.reduce(_ unionByName _)
    stacked.orderBy(col("col_name"))
  }

  /** Hourly z-score series (operational anomaly detection): event counts
    * per hour scored against the whole series' mean and sample stddev.
    * Counts are exact integers; mean/std are the only fp aggregates and
    * the score is rounded like every cross-engine aggregate here. */
  def q47HourlyZscore(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val stats = hourly.agg(
      avg(col("n_events")).as("_mu"), stddev_samp(col("n_events")).as("_sd"))
    hourly.crossJoin(broadcast(stats))
      .select(unix_micros(col("hour")).as("hour_us"), col("n_events"),
        round((col("n_events") - col("_mu")) / col("_sd"), 2).as("zscore"))
      .orderBy(col("hour_us"))
  }

  /** The STATISTICAL aggregate family — corr, sample covariance, and
    * OLS regression slope/intercept (value vs hour-of-day, per event
    * type): the "does the metric trend through the day" screen that
    * every monitoring stack runs. All four are algebraic one-pass
    * aggregates (sums of x, y, x², xy) — partial+final like any sum, one
    * shuffle of |types| rows, nothing iterative. Determinism: both
    * engines compute the same closed forms on doubles; results round to
    * 4 decimals against accumulation-order ULPs (the q47 convention). */
  def q52ValueRegression(s: SparkSession, dir: String): DataFrame = {
    val x = hour(col("ts")).cast("double")
    Tables.events(s, dir)
      .select(col("event_type"), x.as("x"), col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("y"), col("x")), 4).as("corr_vh"),
        round(covar_samp(col("y"), col("x")), 4).as("covar_vh"),
        round(regr_slope(col("y"), col("x")), 4).as("slope"),
        round(regr_intercept(col("y"), col("x")), 4).as("intercept"))
      .orderBy(col("event_type"))
  }

  /** The string-function family exercised explicitly (it is implicit in
    * many queries, but a user switching engines greps for these by
    * name): case, substring, pad, reverse, translate-style replace,
    * trim, repeat — all per-row codegen'd, pushdown-friendly. */
  def q48StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 100)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        lower(col("p_brand")).as("brand_lc"),
        lpad(col("p_type"), 12, "_").as("type_padded"),
        reverse(col("p_name")).as("name_rev"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("name_devoweled"),
        trim(concat_ws(" | ", col("p_brand"), col("p_type"))).as("brand_type"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))

  /** Winsorized (clipped) robust statistics per event type — the
    * outlier-tolerant feature normalisation every training pipeline runs
    * before z-scoring: exact p05/p95 per group, values clamped into that
    * band, then the robust mean. Two passes by design — percentiles need
    * the full group before any row can be clipped — but the second pass
    * joins against a 5-row broadcast of per-group bounds, so nothing
    * reshuffles the fact table twice. */
  def evWinsorized(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val pct = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("p05"),
        expr("percentile(value, 0.95)").as("p95"))
    ev.join(broadcast(pct), "event_type")
      .groupBy(col("event_type"))
      .agg(round(max(col("p05")), 4).as("p05"),
        round(max(col("p95")), 4).as("p95"),
        round(avg(least(greatest(col("value"), col("p05")), col("p95"))), 4)
          .as("winsorized_mean"),
        sum(when(col("value") < col("p05") || col("value") > col("p95"), 1L)
          .otherwise(0L)).as("n_clipped"))
      .orderBy(col("event_type"))
  }

  /** Exponentially weighted moving average over the per-day mean value of
    * each event type — the time-series smoothing / drift-tracking shape
    * (monitor a metric, weight recent days geometrically). The recurrence
    * e_i = a*x_i + (1-a)*e_(i-1) is evaluated in CLOSED FORM as one
    * weighted sum per group (weight pow(1-a, n-i), seeded with the first
    * day's full mass), so there is no sequential scan: the daily
    * aggregate shuffles once, the window ranks rows within each group,
    * and the final sum is an ordinary hash aggregate. Constants enter as
    * the literal doubles 0.3/0.7 on both engines (never 1.0-0.3, whose
    * rounding differs from the 0.7 literal). */
  def evEwma(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(avg(col("value")).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val daysW = Window.partitionBy(col("event_type"))
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(daysW))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        round(sum(
          when(col("rn") === 1, pow(lit(0.7), col("n") - 1) * col("x"))
            .otherwise(lit(0.3) * pow(lit(0.7), col("n") - col("rn")) * col("x"))),
          4).as("ewma"),
        round(max(when(col("rn") === col("n"), col("x"))), 4).as("last_mean"))
      .orderBy(col("event_type"))
  }

  /** Entity resolution by blocking + pairwise scoring (the Fellegi-Sunter
    * blocking shape every record-linkage pipeline runs): candidate pairs
    * are generated ONLY within a blocking key — the 17-char name prefix,
    * so each block holds ~10 records — then scored with Levenshtein
    * distance and an account-balance proximity rule. At 100 TB the
    * blocking key is the whole point: the pair space collapses from
    * O(n²) to sum of per-block squares, the blocks shuffle-partition
    * evenly, and no all-pairs stage ever exists. DuckDB ships the same
    * `levenshtein`, so the rule is oracle-checked end to end. */
  def custEntityResolution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        substring(col("c_name"), 1, 17).as("blk"))
    val a = c.select(col("blk"), col("c_custkey").as("id1"),
      col("c_name").as("name1"), col("c_acctbal").as("bal1"))
    val b = c.select(col("blk"), col("c_custkey").as("id2"),
      col("c_name").as("name2"), col("c_acctbal").as("bal2"))
    a.join(b, Seq("blk"))
      .filter(col("id1") < col("id2"))
      .withColumn("name_dist", levenshtein(col("name1"), col("name2")))
      .filter(col("name_dist") <= 1 &&
        abs(col("bal1") - col("bal2")) < 100.0)
      .select(col("id1"), col("id2"), col("name_dist"),
        round(abs(col("bal1") - col("bal2")), 2).as("bal_diff"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Data-quality assertion suite (the Deequ / Great-Expectations shape
    * every production lake runs nightly): one row per check —
    * primary-key uniqueness, foreign-key orphans, null counts, domain
    * ranges — with the violation count and verdict. Each check is an
    * aggregate over one scan (the FK check is a left-anti join); the
    * suite unions fixed single-row results, so the output is bounded by
    * the check count, never the data. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    def row(name: String, target: String,
            violations: org.apache.spark.sql.Column, df: DataFrame) =
      df.agg(violations.cast("long").as("violations"))
        .select(lit(name).as("check"), lit(target).as("target"),
          col("violations"), (col("violations") === 0L).as("pass"))
    val li = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val checks = Seq(
      row("pk_unique", "orders",
        count(lit(1)) - countDistinct(col("o_orderkey")), orders),
      row("pk_unique", "customer",
        count(lit(1)) - countDistinct(col("c_custkey")), cust),
      row("fk_orphans", "lineitem->orders", count(lit(1)),
        li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")),
      row("fk_orphans", "orders->customer", count(lit(1)),
        orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")),
      row("not_null", "lineitem.l_quantity",
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)), li),
      row("range_0_1", "lineitem.l_discount",
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)), li),
      row("nonnegative", "lineitem.l_extendedprice",
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)), li))
    checks.reduce(_ unionByName _).orderBy(col("check"), col("target"))
  }

  /** Snapshot diff (the run-over-run regression detector every pipeline
    * needs): per-user value aggregates at the PREVIOUS snapshot (events
    * before the cut) vs the CURRENT one (all events), classified into
    * added / changed / unchanged keys per event type. One full-outer
    * join of two aggregates of the same scan; counts only, so the
    * output is bounded by the type space. */
  def evSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cut = ts("2024-01-20 00:00:00")
    def snap(df: DataFrame) = df.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val old = snap(ev.filter(col("ts") < cut))
      .withColumnRenamed("n", "n_old")
    val cur = snap(ev).withColumnRenamed("n", "n_cur")
    old.join(cur, Seq("event_type", "user_id"), "full_outer")
      .withColumn("state",
        when(col("n_old").isNull, "added")
          .when(col("n_cur").isNull, "removed")
          .when(col("n_old") === col("n_cur"), "unchanged")
          .otherwise("changed"))
      .groupBy(col("event_type"), col("state"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("event_type"), col("state"))
  }

  /** TPC-H Q15's shape — top supplier(s) by quarterly revenue via a
    * derived aggregate joined against its own maximum (the "view +
    * HAVING max" classic, tie-preserving). Revenue accumulates as
    * DECIMAL(18,4) (order-free — the q42/q43 lesson) and the max-match
    * happens on the EXACT decimal before any rounding, so ties survive
    * fp formatting. The max is a one-row broadcast; nothing re-sorts the
    * revenue table. */
  def q54TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("total_revenue").cast("double"), 2).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Supply-concentration analysis (the Q20-adjacent shape, partsupp-
    * free): per-part Herfindahl index over supplier quantity shares —
    * the standard concentration statistic — with the 20 most
    * concentrated multi-supplier parts reported. Quantities are
    * integer-valued doubles so group sums are exact; HHI rounds to 6dp
    * BEFORE the ordering, with partkey as the tiebreak, so the top-20
    * cut is engine-stable. One (part, supplier) aggregate + one
    * part-window; no self-join. */
  def q55SupplierConcentration(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val share = col("qty") / col("part_qty")
    ps.withColumn("part_qty", sum(col("qty")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .filter(col("n_supp") >= 2)
      .groupBy(col("l_partkey"))
      .agg(max(col("n_supp")).as("n_supp"),
        round(sum(share * share), 6).as("hhi"),
        round(max(share), 4).as("top_share"))
      .orderBy(col("hhi").desc, col("l_partkey"))
      .limit(20)
  }

  /** Equi-depth histogram of `value` (the ANALYZE-TABLE histogram every
    * optimizer builds): decile boundaries from ONE exact-percentile
    * aggregate, then a distributed bucket-assignment pass — never an
    * ntile over a global sort, which would funnel the table through a
    * single-partition window. Boundaries round to 4dp on both engines
    * before the strict-< comparison so a 1-ulp interpolation difference
    * cannot flip a row's bucket. */
  def evEquidepthHist(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val qs = (1 to 9).map(_ / 10.0).mkString(", ")
    val bounds = ev.agg(expr(s"percentile(value, array($qs))").as("bs"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        size(filter(col("bs"), b => round(b, 4) < col("value"))))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 4).as("lo"),
        round(max(col("value")), 4).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Exact triangle counting with degree-ordered edge orientation (the
    * "forward" algorithm — Schank & Wagner '05 / Suri & Vassilvitskii
    * WWW'11's MR formulation; public literature): orient every
    * undirected edge from its lower-(degree, id) endpoint to the higher,
    * join wedges, close them against the oriented edge set. Each
    * triangle is found exactly once, and — the 100 TB point — every
    * wedge is generated at its LOWEST-degree corner, so a power-law hub
    * with degree d contributes O(d) wedges instead of O(d²); the two
    * joins shuffle on node keys and AQE handles residual skew. Output is
    * per-node triangle participation (integer-exact, no fp concerns). */
  def evTriangles(s: SparkSession, dir: String): DataFrame = {
    val und = kTransitions(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient: a = lower-(deg, id) endpoint — wedges fan out from the
    // cheap corner, never the hub
    val e1 = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
      .localCheckpoint(eager = false) // reused three times in the wedge close
    val ab = e1.select(col("a"), col("b"))
    val bc = e1.select(col("a").as("b"), col("b").as("c"))
    val ac = e1.select(col("a").as("a2"), col("b").as("c2"))
    val tris = ab.join(bc, "b")
      .join(ac, col("a") === col("a2") && col("c") === col("c2"))
      .select(col("a"), col("b"), col("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("node"))
  }

  /** Bounded-depth reachability over the journey graph (the recursive-
    * traversal family — WITH RECURSIVE in SQL engines, BFS frontier
    * expansion here): minimum hop count from source node 0 within 3
    * hops. Each round joins the CURRENT frontier (small) against the
    * edge set — the standard distributed BFS where work per round is
    * O(frontier × out-degree), never all-pairs; the oracle unrolls the
    * same three relaxations with least() merges. Deterministic integer
    * output. */
  def evReachability(s: SparkSession, dir: String): DataFrame = {
    val edges = kTransitions(s, dir)
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = true) // re-joined per BFS round
    var dist = edges.sparkSession.range(1)
      .select(lit(0L).as("node"), lit(0).as("hops"))
    (1 to 3).foreach { _ =>
      val expanded = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
      dist = dist.unionByName(expanded)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
        .localCheckpoint(eager = true)
    }
    dist.orderBy(col("node"))
  }

  /** Slowly-changing-dimension Type 2 history build (the Kimball SCD2
    * shape every warehouse maintains): per user, each change of
    * event_type opens a new validity interval, closed by the next
    * change's timestamp; the current row carries an open interval. One
    * user-keyed shuffle drives both windows (change detection and
    * interval close), timestamps project to epoch micros per the
    * determinism rule. Restricted to user_id < 100 to keep the verify
    * dump bounded; the plan is invariant in the predicate. */
  def evScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(s, dir)
      .filter(col("user_id") < 100)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changes
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("valid_from_us"),
        unix_micros(col("valid_to_ts")).as("valid_to_us"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"))
  }

  /** The ARRAY / higher-order-function family exercised explicitly
    * (transform, filter, exists, aggregate/fold, zip_with, sort, slice,
    * distinct — the lambda surface a switching user greps for): build a
    * token array per doc, then derive with one HOF each. All per-row
    * codegen'd; no shuffle until the presentation sort. */
  def q53ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .filter(col("doc_id") <= 100)
      .select(col("doc_id"),
        size(transform(toks, t => length(t))).as("n_tokens"),
        size(filter(toks, t => length(t) >= 6)).as("n_long_tokens"),
        exists(toks, t => t.startsWith("z")).as("has_z_token"),
        aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
          .as("total_chars"),
        aggregate(zip_with(toks, slice(toks, 2, 1000000),
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (a, x) => a + x).as("n_repeated_adjacent"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), ",")
          .as("first3_sorted"))
      .orderBy(col("doc_id"))
  }

  /** Running DISTINCT-user count per event type (cumulative uniques —
    * the growth-curve recipe): windows don't support COUNT(DISTINCT), so
    * the portable formulation is first-occurrence flags (row_number == 1
    * per (type, user)) summed per (type, day) and running-summed over
    * days. The first-occurrence window partitions by (type, user) —
    * high cardinality, parallel at any scale — and the ONLY cumulative
    * window runs over the tiny per-(type, day) aggregate, so no task
    * ever sees one event type's full event stream (the r6 verdict's
    * skew finding: partitioning the running sum by low-cardinality
    * event_type alone would funnel each type's whole history through
    * one window task at 100×). Output identical: the cumulative new-user
    * count through each day IS the distinct-users-to-date. */
  def q49RunningDistinct(s: SparkSession, dir: String): DataFrame = {
    val firstSeen = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byDay = Window.partitionBy(col("event_type"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("_first", when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("_first")).as("_new_users"))
      .withColumn("distinct_users_to_date", sum(col("_new_users")).over(byDay))
      .drop("_new_users")
      .orderBy(col("event_type"), col("day"))
  }

  /** The ZOrder operator's math surfaced as an oracle-checked projection
    * (r6 verdict item 1: the operator existed only behind ZOrderSpec):
    * per-event 16-bit grid cells over (value, user_id) and their Morton
    * z-value — the exact columns layoutByZOrder range-partitions on.
    * Pure integer/IEEE arithmetic end to end (scale bounds from one
    * min/max agg, magic-mask bit spreads), so DuckDB replays it
    * bit-identically; the layout side (repartitionByRange + write) stays
    * under ZOrderSpec's measured file-skipping gate. */
  def q50ZorderCells(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val r = ev.agg(
      min(col("value")).cast("double"), max(col("value")).cast("double"),
      min(col("user_id")).cast("double"), max(col("user_id")).cast("double")).head()
    // empty input: min/max are null — project nothing rather than NPE
    // (grid bounds of an empty relation are meaningless either way)
    if (r.isNullAt(0)) return ev.select(col("event_id"),
      lit(0L).as("cell_value"), lit(0L).as("cell_user"), lit(0L).as("z_value"))
    val cv = ZOrder.gridCell(col("value"), r.getDouble(0), r.getDouble(1))
    val cu = ZOrder.gridCell(col("user_id"), r.getDouble(2), r.getDouble(3))
    ev.select(col("event_id"), cv.as("cell_value"), cu.as("cell_user"),
        ZOrder.zValue(cv, cu).as("z_value"))
      .orderBy(col("event_id"))
  }

  /** The IncrementalAgg operator as an oracle-checked query (r6 verdict
    * item 1): build the aggregate STATE from events before a cut date,
    * then IVM-refresh it with the post-cut delta — the oracle recomputes
    * the same aggregates over ALL events, so a green row proves
    * refresh(state, delta) ≡ full recompute, the defining IVM property.
    * Sums ride as exact DECIMAL(18,4) (order-free — the q42/q43 sf0.1
    * lesson) and avg divides once at read time from (sum, count); min/max
    * project raw doubles (exact input values, no accumulation). */
  def q51IncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import IncrementalAgg._
    val aggs = Seq(
      countAll("n_events"),
      AggSpec("sum_value",
        sum(col("value").cast("decimal(18,4)")), (a, b) => a + b),
      minOf("value", "min_value"),
      maxOf("value", "max_value"))
    val ev = Tables.events(s, dir)
    val cut = ts("2024-01-20 00:00:00")
    val state = initial(ev.filter(col("ts") < cut), Seq("event_type"), aggs)
    val refreshed = refresh(state, ev.filter(col("ts") >= cut),
      Seq("event_type"), aggs)
    refreshed.select(col("event_type"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"),
        (col("sum_value").cast("double") / col("n_events").cast("double"))
          .as("avg_value"),
        col("min_value"), col("max_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_zorder_cells" -> (q50ZorderCells _),
    "q51_incremental_agg" -> (q51IncrementalAgg _),
    "q49_running_distinct" -> (q49RunningDistinct _),
    "q48_string_funcs" -> (q48StringFuncs _),
    "q46_profile" -> (q46Profile _),
    "q47_hourly_zscore" -> (q47HourlyZscore _),
    "q52_value_regression" -> (q52ValueRegression _),
    "q53_array_funcs" -> (q53ArrayFuncs _),
    "q44_funnel" -> (q44Funnel _),
    "q45_retention" -> (q45Retention _),
    "ev_journey_trigrams" -> (evJourneyTrigrams _),
    "ev_ordered_funnel" -> (evOrderedFunnel _),
    "ev_ohlc" -> (evOhlc _),
    "ev_pagerank" -> (evPagerank _),
    "cust_entity_resolution" -> (custEntityResolution _),
    "ev_winsorized" -> (evWinsorized _),
    "ev_ewma" -> (evEwma _),
    "ev_triangles" -> (evTriangles _),
    "ev_scd2" -> (evScd2 _),
    "ev_equidepth_hist" -> (evEquidepthHist _),
    "ev_reachability" -> (evReachability _),
    "q54_top_supplier" -> (q54TopSupplier _),
    "dq_checks" -> (dqChecks _),
    "ev_snapshot_diff" -> (evSnapshotDiff _),
    "q55_supplier_concentration" -> (q55SupplierConcentration _),
    "q40_sessionize" -> (q40Sessionize _),
    "q41_stratified_sample" -> (q41StratifiedSample _),
    "q42_market_share" -> (q42MarketShare _),
    "q43_product_profit" -> (q43ProductProfit _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_semi_join" -> (q04SemiJoin _),
    "q05_local_supplier" -> (q05LocalSupplier _),
    "q06_revenue_forecast" -> (q06RevenueForecast _),
    "q07_cust_no_orders" -> (q07CustNoOrders _),
    "q08_distinct_parts" -> (q08DistinctParts _),
    "q09_topk_per_group" -> (q09TopkPerGroup _),
    "q10_rollup" -> (q10Rollup _),
    "q11_cube" -> (q11Cube _),
    "q12_grouping_sets" -> (q12GroupingSets _),
    "q13_running_sum" -> (q13RunningSum _),
    "q14_lag_lead" -> (q14LagLead _),
    "q15_intersect" -> (q15Intersect _),
    "q16_except" -> (q16Except _),
    "q17_range_join" -> (q17RangeJoin _),
    "q18_cross_join" -> (q18CrossJoin _),
    "q19_sort_limit" -> (q19SortLimit _),
    "q20_approx_distinct" -> (q20ApproxDistinct _),
    "q21_above_avg" -> (q21AboveAvg _),
    "q22_left_join" -> (q22LeftJoin _),
    "q23_full_outer" -> (q23FullOuter _),
    "q24_union" -> (q24Union _),
    "q25_sliding_window" -> (q25SlidingWindow _),
    "q26_session_window" -> (q26SessionWindow _),
    "q27_rank_funcs" -> (q27RankFuncs _),
    "q28_percentiles" -> (q28Percentiles _),
    "q29_first_last" -> (q29FirstLast _),
    "q30_right_outer" -> (q30RightOuter _),
    "q31_approx_percentile" -> (q31ApproxPercentile _),
    "q32_salted_join" -> (q32SaltedJoin _),
    "q33_pivot" -> (q33Pivot _),
    "q34_unpivot" -> (q34Unpivot _),
    "q35_lateral" -> (q35Lateral _),
    "q36_range_frame" -> (q36RangeFrame _),
    "q37_gap_fill" -> (q37GapFill _),
    "q38_like_json_tuple" -> (q38LikeJsonTuple _),
    "q39_decimal_agg" -> (q39DecimalAgg _),
  )

  val oracles: Map[String, String] = Map(
    "q50_zorder_cells" ->
      """WITH b AS (
        |  SELECT CAST(min(value) AS DOUBLE) AS vmin, CAST(max(value) AS DOUBLE) AS vmax,
        |         CAST(min(user_id) AS DOUBLE) AS umin, CAST(max(user_id) AS DOUBLE) AS umax
        |  FROM events
        |), g AS (
        |  SELECT event_id,
        |    least(greatest(CAST(floor((CAST(value AS DOUBLE) - vmin)
        |      / (CASE WHEN vmax > vmin THEN vmax - vmin ELSE 1.0 END) * 65535.0) AS BIGINT), 0), 65535) AS cv,
        |    least(greatest(CAST(floor((CAST(user_id AS DOUBLE) - umin)
        |      / (CASE WHEN umax > umin THEN umax - umin ELSE 1.0 END) * 65535.0) AS BIGINT), 0), 65535) AS cu
        |  FROM events, b
        |), s1 AS (SELECT event_id, cv, cu, (cv | (cv << 8)) & 16711935 AS a1, (cu | (cu << 8)) & 16711935 AS b1 FROM g
        |), s2 AS (SELECT event_id, cv, cu, (a1 | (a1 << 4)) & 252645135 AS a2, (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1
        |), s3 AS (SELECT event_id, cv, cu, (a2 | (a2 << 2)) & 858993459 AS a3, (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2
        |), s4 AS (SELECT event_id, cv, cu, (a3 | (a3 << 1)) & 1431655765 AS a4, (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
        |SELECT event_id, cv AS cell_value, cu AS cell_user, (a4 | (b4 << 1)) AS z_value
        |FROM s4 ORDER BY event_id""".stripMargin,
    "q51_incremental_agg" ->
      """SELECT event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q40_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |  FROM events
        |), b AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |                  THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |      AS session_id
        |  FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
        |  round(sum(value), 2) AS session_value
        |FROM b GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q41_stratified_sample" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (doc_id * 2654435761 + 17) % 1000000007, doc_id) AS rk
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_sampled, min(doc_id) AS min_sampled_id,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rk <= 10 GROUP BY source ORDER BY source""".stripMargin,
    "q49_running_distinct" ->
      """WITH flagged AS (
        |  SELECT event_type, ts, event_id,
        |    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
        |                                 ORDER BY ts, event_id) = 1
        |         THEN 1 ELSE 0 END AS first_seen
        |  FROM events),
        |cum AS (
        |  SELECT event_type, ts,
        |    sum(first_seen) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS c
        |  FROM flagged)
        |SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |  CAST(max(c) AS BIGINT) AS distinct_users_to_date
        |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q48_string_funcs" ->
      """SELECT p_partkey,
        | upper(substring(p_name, 1, 8)) AS name_prefix,
        | lower(p_brand) AS brand_lc,
        | lpad(p_type, 12, '_') AS type_padded,
        | reverse(p_name) AS name_rev,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
        | trim(concat_ws(' | ', p_brand, p_type)) AS brand_type,
        | repeat(p_brand, 2) AS brand_x2,
        | length(p_name) AS name_len
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin,
    "q46_profile" ->
      """WITH base AS (
        |  SELECT count(*) AS n FROM lineitem)
        |SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val, mean_val
        |FROM (
        |  SELECT 'l_discount' AS col_name, (SELECT n FROM base) AS n_rows,
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    count(DISTINCT l_discount) AS n_distinct,
        |    round(min(l_discount), 4) AS min_val, round(max(l_discount), 4) AS max_val,
        |    round(avg(l_discount), 4) AS mean_val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', (SELECT n FROM base),
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_extendedprice),
        |    round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
        |    round(avg(l_extendedprice), 4) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', (SELECT n FROM base),
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_quantity),
        |    round(min(l_quantity), 4), round(max(l_quantity), 4),
        |    round(avg(l_quantity), 4) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', (SELECT n FROM base),
        |    CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_tax),
        |    round(min(l_tax), 4), round(max(l_tax), 4),
        |    round(avg(l_tax), 4) FROM lineitem
        |) t ORDER BY col_name""".stripMargin,
    "q47_hourly_zscore" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
        |  FROM events GROUP BY 1),
        |stats AS (SELECT avg(n_events) AS mu, stddev_samp(n_events) AS sd FROM hourly)
        |SELECT epoch_us(hour) AS hour_us, n_events,
        |  round((n_events - mu) / sd, 2) AS zscore
        |FROM hourly CROSS JOIN stats ORDER BY hour_us""".stripMargin,
    "q53_array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id <= 100
        |)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(list_filter(toks, x -> length(x) >= 6)) AS n_long_tokens,
        |  len(list_filter(toks, x -> x LIKE 'z%')) > 0 AS has_z_token,
        |  CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
        |    AS INTEGER) AS total_chars,
        |  coalesce(CAST(list_aggregate(list_transform(range(1, len(toks)),
        |      i -> CASE WHEN toks[i] = toks[i+1] THEN 1 ELSE 0 END), 'sum')
        |    AS INTEGER), 0) AS n_repeated_adjacent,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
        |FROM t ORDER BY doc_id""".stripMargin,
    "q52_value_regression" ->
      """SELECT event_type, count(*) AS n,
        |  round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_vh,
        |  round(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh,
        |  round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 4) AS slope,
        |  round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 4) AS intercept
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q44_funnel" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT su.user_id, su.signup_ts,
        |    min(CASE WHEN p.ts >= su.signup_ts THEN p.ts END) AS conv_ts
        |  FROM su LEFT JOIN events p
        |    ON p.user_id = su.user_id AND p.event_type = 'purchase'
        |  GROUP BY su.user_id, su.signup_ts)
        |SELECT strftime(signup_ts, '%Y-%m-%d') AS signup_date,
        |  count(*) AS n_signups,
        |  CAST(sum(CASE WHEN conv_ts <= signup_ts + INTERVAL 3 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_ohlc" ->
      """SELECT event_type, date_trunc('hour', ts) AS hour,
        |  arg_min(value, printf('%020d%010d', epoch_us(ts), event_id)) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, printf('%020d%010d', epoch_us(ts), event_id)) AS close,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_ordered_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT v.user_id, v.v_ts,
        |    min(CASE WHEN e.ts >= v.v_ts THEN e.ts END) AS c_ts
        |  FROM v LEFT JOIN events e
        |    ON e.user_id = v.user_id AND e.event_type = 'click'
        |  GROUP BY v.user_id, v.v_ts),
        |p AS (
        |  SELECT c.user_id, c.v_ts, c.c_ts,
        |    min(CASE WHEN e.ts >= c.c_ts THEN e.ts END) AS p_ts
        |  FROM c LEFT JOIN events e
        |    ON e.user_id = c.user_id AND e.event_type = 'purchase'
        |  GROUP BY c.user_id, c.v_ts, c.c_ts)
        |SELECT strftime(v_ts, '%Y-%m-%d') AS cohort_date,
        |  count(*) AS n_viewed,
        |  CAST(sum(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked,
        |  CAST(sum(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_journey_trigrams" ->
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS types
        |  FROM events GROUP BY user_id
        |), tg AS (
        |  SELECT unnest(list_transform(range(1, len(types) - 1),
        |    i -> concat_ws('>', types[i], types[i+1], types[i+2]))) AS trigram
        |  FROM seqs WHERE len(types) >= 3
        |)
        |SELECT trigram, count(*) AS n FROM tg GROUP BY trigram
        |ORDER BY n DESC, trigram LIMIT 20""".stripMargin,
    "ev_pagerank" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |tr AS (
        |  SELECT lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |    k AS dst
        |  FROM ev),
        |edges AS (
        |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
        |  FROM tr WHERE src IS NOT NULL GROUP BY src, dst),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |outw AS (SELECT src, sum(w) AS wsum FROM edges GROUP BY src),
        |base AS (SELECT (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
        |                / (SELECT n FROM nn) AS b),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r
        |       FROM nodes),
        |d0 AS (SELECT coalesce(sum(r), 0) AS dm FROM r0
        |       LEFT JOIN outw ON r0.node = outw.src WHERE outw.src IS NULL),
        |c0 AS (SELECT e.dst AS node, sum(r0.r / o.wsum * e.w) AS c
        |       FROM edges e JOIN r0 ON e.src = r0.node
        |       JOIN outw o ON o.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.node, (SELECT b FROM base) + CAST(0.85 AS DOUBLE)
        |         * (coalesce(c0.c, 0)
        |            + (SELECT dm FROM d0) / (SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN c0 ON nodes.node = c0.node),
        |d1 AS (SELECT coalesce(sum(r), 0) AS dm FROM r1
        |       LEFT JOIN outw ON r1.node = outw.src WHERE outw.src IS NULL),
        |c1 AS (SELECT e.dst AS node, sum(r1.r / o.wsum * e.w) AS c
        |       FROM edges e JOIN r1 ON e.src = r1.node
        |       JOIN outw o ON o.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.node, (SELECT b FROM base) + CAST(0.85 AS DOUBLE)
        |         * (coalesce(c1.c, 0)
        |            + (SELECT dm FROM d1) / (SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN c1 ON nodes.node = c1.node),
        |d2 AS (SELECT coalesce(sum(r), 0) AS dm FROM r2
        |       LEFT JOIN outw ON r2.node = outw.src WHERE outw.src IS NULL),
        |c2 AS (SELECT e.dst AS node, sum(r2.r / o.wsum * e.w) AS c
        |       FROM edges e JOIN r2 ON e.src = r2.node
        |       JOIN outw o ON o.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.node, (SELECT b FROM base) + CAST(0.85 AS DOUBLE)
        |         * (coalesce(c2.c, 0)
        |            + (SELECT dm FROM d2) / (SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN c2 ON nodes.node = c2.node)
        |SELECT node, round(r, 6) AS rank FROM r3 ORDER BY node""".stripMargin,
    "cust_entity_resolution" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |    substring(c_name, 1, 17) AS blk
        |  FROM customer)
        |SELECT a.c_custkey AS id1, b.c_custkey AS id2,
        |  levenshtein(a.c_name, b.c_name) AS name_dist,
        |  round(abs(a.c_acctbal - b.c_acctbal), 2) AS bal_diff
        |FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |  AND abs(a.c_acctbal - b.c_acctbal) < 100.0
        |ORDER BY id1, id2""".stripMargin,
    "ev_winsorized" ->
      """WITH pct AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS p05,
        |    quantile_cont(value, 0.95) AS p95
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  round(max(p.p05), 4) AS p05,
        |  round(max(p.p95), 4) AS p95,
        |  round(avg(least(greatest(e.value, p.p05), p.p95)), 4)
        |    AS winsorized_mean,
        |  CAST(sum(CASE WHEN e.value < p.p05 OR e.value > p.p95
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |FROM events e JOIN pct p USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "ev_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily)
        |SELECT event_type, max(n) AS n_days,
        |  round(sum(CASE WHEN rn = 1
        |              THEN pow(CAST(0.7 AS DOUBLE), n - 1) * x
        |              ELSE CAST(0.3 AS DOUBLE)
        |                   * pow(CAST(0.7 AS DOUBLE), n - rn) * x END),
        |        4) AS ewma,
        |  round(max(CASE WHEN rn = n THEN x END), 4) AS last_mean
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'pk_unique' AS check, 'orders' AS target,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
        |    count(*) = count(DISTINCT o_orderkey) AS pass FROM orders
        |  UNION ALL
        |  SELECT 'pk_unique', 'customer',
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
        |    count(*) = count(DISTINCT c_custkey) FROM customer
        |  UNION ALL
        |  SELECT 'fk_orphans', 'lineitem->orders',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'fk_orphans', 'orders->customer',
        |    CAST(count(*) AS BIGINT), count(*) = 0
        |  FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'not_null', 'lineitem.l_quantity',
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) = 0 FROM lineitem
        |  UNION ALL
        |  SELECT 'range_0_1', 'lineitem.l_discount',
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |             THEN 1 ELSE 0 END) AS BIGINT),
        |    sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |        THEN 1 ELSE 0 END) = 0 FROM lineitem
        |  UNION ALL
        |  SELECT 'nonnegative', 'lineitem.l_extendedprice',
        |    CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT),
        |    sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) = 0 FROM lineitem
        |) t ORDER BY "check", target""".stripMargin,
    "ev_snapshot_diff" ->
      """WITH old AS (
        |  SELECT event_type, user_id, count(*) AS n_old
        |  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
        |  GROUP BY 1, 2),
        |cur AS (
        |  SELECT event_type, user_id, count(*) AS n_cur
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(o.event_type, c.event_type) AS event_type,
        |    CASE WHEN o.n_old IS NULL THEN 'added'
        |         WHEN c.n_cur IS NULL THEN 'removed'
        |         WHEN o.n_old = c.n_cur THEN 'unchanged'
        |         ELSE 'changed' END AS state
        |  FROM old o FULL OUTER JOIN cur c
        |    ON o.event_type = c.event_type AND o.user_id = c.user_id)
        |SELECT event_type, state, count(*) AS n_keys
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q54_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  round(CAST(total_revenue AS DOUBLE), 2) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q55_supplier_concentration" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |shares AS (
        |  SELECT l_partkey, l_suppkey, qty,
        |    sum(qty) OVER (PARTITION BY l_partkey) AS part_qty,
        |    count(*) OVER (PARTITION BY l_partkey) AS n_supp
        |  FROM ps)
        |SELECT l_partkey, max(n_supp) AS n_supp,
        |  round(sum((qty / part_qty) * (qty / part_qty)), 6) AS hhi,
        |  round(max(qty / part_qty), 4) AS top_share
        |FROM shares WHERE n_supp >= 2
        |GROUP BY l_partkey
        |ORDER BY hhi DESC, l_partkey LIMIT 20""".stripMargin,
    "ev_equidepth_hist" ->
      """WITH bounds AS (
        |  SELECT quantile_cont(value,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM events)
        |SELECT len(list_filter(bs, b -> round(b, 4) < value)) AS bucket,
        |  count(*) AS n,
        |  round(min(value), 4) AS lo,
        |  round(max(value), 4) AS hi
        |FROM events, bounds
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "ev_triangles" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |tr AS (
        |  SELECT lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev, k
        |  FROM ev),
        |und AS (
        |  SELECT DISTINCT least(prev, k) AS u, greatest(prev, k) AS v
        |  FROM tr WHERE prev IS NOT NULL AND prev <> k),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM und UNION ALL SELECT v FROM und) t
        |  GROUP BY node),
        |e1 AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN u ELSE v END AS a,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
        |              THEN v ELSE u END AS b
        |  FROM und JOIN deg du ON du.node = und.u
        |           JOIN deg dv ON dv.node = und.v),
        |tri AS (
        |  SELECT ab.a, ab.b, bc.b AS c
        |  FROM e1 ab JOIN e1 bc ON bc.a = ab.b
        |             JOIN e1 ac ON ac.a = ab.a AND ac.b = bc.b),
        |corners AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, count(*) AS n_triangles
        |FROM corners GROUP BY node ORDER BY node""".stripMargin,
    "ev_reachability" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |tr AS (
        |  SELECT lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src, k
        |  FROM ev),
        |edges AS (
        |  SELECT DISTINCT src, k AS dst FROM tr
        |  WHERE src IS NOT NULL AND src <> k),
        |d0 AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS hops),
        |d1 AS (
        |  SELECT node, min(hops) AS hops FROM (
        |    SELECT node, hops FROM d0
        |    UNION ALL
        |    SELECT e.dst AS node, d0.hops + 1 AS hops
        |    FROM d0 JOIN edges e ON d0.node = e.src) t
        |  GROUP BY node),
        |d2 AS (
        |  SELECT node, min(hops) AS hops FROM (
        |    SELECT node, hops FROM d1
        |    UNION ALL
        |    SELECT e.dst AS node, d1.hops + 1 AS hops
        |    FROM d1 JOIN edges e ON d1.node = e.src) t
        |  GROUP BY node),
        |d3 AS (
        |  SELECT node, min(hops) AS hops FROM (
        |    SELECT node, hops FROM d2
        |    UNION ALL
        |    SELECT e.dst AS node, d2.hops + 1 AS hops
        |    FROM d2 JOIN edges e ON d2.node = e.src) t
        |  GROUP BY node)
        |SELECT node, hops FROM d3 ORDER BY node""".stripMargin,
    "ev_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type
        |  FROM events WHERE user_id < 100),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM (
        |    SELECT user_id, ts, event_id, event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS prev_type
        |    FROM ev) t
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id)) AS valid_to_us,
        |  (lead(ts) OVER (PARTITION BY user_id
        |                  ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM ch ORDER BY user_id, valid_from_us""".stripMargin,
    "q45_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |first_seen AS (SELECT user_id, min(d) AS cohort_d FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, d FROM ev)
        |SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort_date,
        |  count(*) AS n_users,
        |  count(a.user_id) AS n_retained_d7
        |FROM first_seen f LEFT JOIN active a
        |  ON a.user_id = f.user_id AND a.d = f.cohort_d + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        | round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |                THEN CAST(l_extendedprice AS DECIMAL(18,4))
        |                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
        |                ELSE 0 END) AS DOUBLE)
        |       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |                  * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
        |       4) AS mkt_share
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_product_profit" ->
      """SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |                * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
        |      AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1 - l_discount) AS revenue, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_local_supplier" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q06_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 25""".stripMargin,
    "q07_cust_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q09_topk_per_group" ->
      """SELECT c_mktsegment, rn, o_orderkey, totalprice FROM (
        | SELECT c_mktsegment, o_orderkey, o_totalprice AS totalprice,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM customer JOIN orders ON c_custkey = o_custkey) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q11_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        | coalesce(o_orderpriority, 'ALL') AS orderpriority,
        | round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q12_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | count(*) AS n, round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q13_running_sum" ->
      """SELECT event_id, user_id,
        | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q14_lag_lead" ->
      """SELECT event_id, user_id,
        | epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
        | lead(event_type, 1) OVER w AS next_type
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q15_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 2500
        |ORDER BY custkey""".stripMargin,
    "q16_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "q17_range_join" ->
      """SELECT p_brand, count(*) AS n_matches, round(sum(l_extendedprice), 2) AS total_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  AND l_quantity BETWEEN p_size - 2 AND p_size + 2
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q18_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q19_sort_limit" ->
      """SELECT o_orderkey, o_totalprice AS totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q21_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i
        |                            WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q22_left_join" ->
      """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin,
    "q23_full_outer" ->
      """SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
        | coalesce(n_supp, 0) AS n_supp, coalesce(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 8000 GROUP BY s_nationkey) s
        |FULL OUTER JOIN (SELECT c_nationkey, count(*) AS n_cust FROM customer
        |      WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
        |  ON s_nationkey = c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q24_union" ->
      """SELECT c_custkey AS entity_key, 'customer' AS side FROM customer
        |WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_suppkey AS entity_key, 'supplier' AS side FROM supplier
        |WHERE s_acctbal > 9000
        |ORDER BY side, entity_key""".stripMargin,
    "q25_sliding_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 5 minutes, ts) - k * INTERVAL 5 minutes)
        |   AS window_start_us,
        | count(*) AS n_records, count(DISTINCT user_id) AS n_users
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 minutes
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, epoch_us(min(ts)) AS session_start_us, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,
    "q27_rank_funcs" ->
      """SELECT c_mktsegment, c_custkey, rnk, drnk, quartile, prank FROM (
        | SELECT c_mktsegment, c_custkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS prank
        | FROM customer
        | WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)) t
        |WHERE rnk <= 8 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,
    "q28_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q29_first_last" ->
      """SELECT DISTINCT user_id,
        | first_value(event_type) OVER w AS first_type,
        | last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,
    "q30_right_outer" ->
      """SELECT c_custkey, c_nationkey, count(o_orderkey) AS n_urgent,
        | round(coalesce(max(o_totalprice), 0), 2) AS max_urgent_price
        |FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_nationkey ORDER BY c_custkey""".stripMargin,
    "q32_salted_join" ->
      """SELECT event_id, user_id, n_user_events
        |FROM (SELECT event_id, user_id FROM events WHERE event_type = 'purchase') e
        |JOIN (SELECT user_id, count(*) AS n_user_events FROM events
        |      GROUP BY user_id) d USING (user_id)
        |ORDER BY event_id""".stripMargin,
    "q33_pivot" ->
      """SELECT l_returnflag,
        | coalesce(round(sum(CASE WHEN lower(l_linestatus) = 'f' THEN l_quantity END), 2), 0) AS f_qty,
        | count(CASE WHEN lower(l_linestatus) = 'f' THEN 1 END) AS f_n,
        | coalesce(round(sum(CASE WHEN lower(l_linestatus) = 'o' THEN l_quantity END), 2), 0) AS o_qty,
        | count(CASE WHEN lower(l_linestatus) = 'o' THEN 1 END) AS o_n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q34_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        |ORDER BY p_partkey, metric""".stripMargin,
    "q35_lateral" ->
      """SELECT n.n_name, t.s_name, t.s_acctbal
        |FROM nation n,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier s
        |         WHERE s.s_nationkey = n.n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 1) t
        |ORDER BY n.n_name""".stripMargin,
    "q36_range_frame" ->
      """SELECT event_id, user_id, n_1h, CAST(cents_1h AS BIGINT) AS cents_1h FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER w AS n_1h,
        |    sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS cents_1h
        |  FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events) e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |) t ORDER BY event_id""".stripMargin,
    "q37_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_ts FROM events
        |), c AS (
        |  SELECT event_type, hour_ts, count(*) AS n FROM ev GROUP BY 1, 2
        |), hours AS (
        |  SELECT unnest(generate_series(min(hour_ts), max(hour_ts),
        |           INTERVAL 1 HOUR)) AS hour_ts FROM ev
        |), types AS (SELECT DISTINCT event_type FROM ev)
        |SELECT t.event_type, epoch_us(h.hour_ts) AS hour_us,
        |  coalesce(c.n, 0) AS n
        |FROM types t CROSS JOIN hours h
        |LEFT JOIN c ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
        |ORDER BY t.event_type, hour_us""".stripMargin,
    "q38_like_json_tuple" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(sum(CASE WHEN json_extract_string(props, '$.missing')
        |                     IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_m_null
        |FROM events
        |WHERE event_type LIKE 'p%' OR event_type LIKE '%iew'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q39_decimal_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS total_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
