package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import QueryUtil._

/** General analytics over the TPC-H-ish testdata — the north-star
  * extension tier of SURVEY.md §7.3 step 8: aggregation, multi-way
  * joins, windows, rollup, semi/anti joins, as-of join.
  *
  * Scale notes (100 TB design intent):
  *  - fact tables (`lineitem`, `orders`, `events`) are only ever
  *    scanned with pushed filters + pruned columns and aggregated with
  *    map-side partial aggregation (groupBy on a declarative plan);
  *  - dimension tables (`region nation customer supplier part`) are
  *    broadcast — no shuffle of the fact side for dim joins;
  *  - top-k is TakeOrderedAndProject (no global sort of the fact);
  *  - windows partition by high-cardinality keys (custkey/event) so
  *    state per partition stays bounded.
  */
object Analytics {

  /** TPC-H Q1-style pricing summary: the flagship scan+aggregate. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avgDec(col("l_quantity")).as("avg_qty"),
        avgDec(col("l_extendedprice")).as("avg_price"),
        avgDec(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join + per-order revenue + top-10.
    * The segment-filtered customer slice carries NO broadcast hint:
    * customer scales with the corpus (150k·SF), so the hint would
    * bypass autoBroadcastJoinThreshold with no fallback and OOM the
    * driver at production scale. AQE broadcasts it at runtime while
    * it fits and falls back to a shuffled hash join beyond the
    * threshold (the q8/q18 treatment). */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join, local-supplier revenue per nation.
    * Customer and supplier must share the nation (the classic
    * co-location predicate). Nation/region (genuinely fixed-size)
    * broadcast by hint; customer and supplier scale with the corpus
    * (150k·SF / 10k·SF), so they carry no hint — AQE broadcasts
    * while they fit and falls back to shuffled hash joins beyond
    * the threshold (the q8/q18 treatment). */
  def q5LocalSupplier(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(s, d)
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q6-style: pure filter + single-row aggregate. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.07) &&
        col("l_quantity") < lit(24.0))
      .agg(sumDec(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** TPC-H Q8-style national market share: for ECONOMY parts bought
    * by ASIA-region customers, the yearly revenue share supplied by
    * NATION_2. Two ratio terms aggregate in one pass (conditional
    * sum over the same joined frame); the FIXED-size dims (part
    * slice, nation, region) broadcast by hint, while customer and
    * supplier — which scale WITH the corpus (TPC-H sizes them at
    * 150k·SF / 10k·SF, and the tpch probe replicates them with the
    * facts) — carry no hint: AQE picks broadcast at runtime while
    * they fit and falls back to a shuffled hash join beyond the
    * threshold, instead of a forced broadcast OOMing the driver at
    * scale (the q18 treatment). */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val custNat = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_regionkey"))
    val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val suppNat = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("s_nation"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_orderdate"), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNat), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sumDec(when(col("s_nation") === "NATION_2", rev).otherwise(0.0)) /
          sumDec(rev), 6).as("mkt_share"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_year")
  }

  /** TPC-H Q10-style returned-item report: top-20 customers by
    * revenue lost to returns in 1996H1. Fact side joins orders with
    * a pushed date filter; nation (fixed-size) broadcasts by hint,
    * customer (corpus-scaled — see [[q8MarketShare]]) is left to
    * AQE's runtime strategy choice; top-20 is
    * TakeOrderedAndProject. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style promo effect: the share of one month's revenue
    * from PROMO-type parts — a conditional-ratio single-row
    * aggregate; the part dim broadcasts, the month filter pushes to
    * the lineitem scan. */
  def q14PromoEffect(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sumDec(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
        sumDec(rev), 6).as("promo_revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q17-style small-quantity revenue: average yearly revenue
    * lost if sub-20%-of-average-quantity orders of one brand's parts
    * stopped. The per-part average is computed over the fact side
    * AFTER the broadcast-semi restriction to the brand's partkeys, so
    * the aggregate shuffles only the brand's slice, and the tiny
    * per-part average frame broadcasts back. */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val brandParts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#13").select("p_partkey")
    val li = Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg(avgDec(col("l_quantity")).as("avg_qty"))
    val out = li
      .join(broadcast(avgQty), col("l_partkey") === col("ap_key"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sumDec(col("l_extendedprice")) / lit(7.0), 6)
        .as("avg_yearly"), count(lit(1)).as("n_rows"))
      .localCheckpoint()
    li.unpersist()
    out
  }

  /** TPC-H Q18-style large-volume orders: orders whose total quantity
    * exceeds 250 (≈ p99), with customer detail. The HAVING aggregate
    * shuffles on the fact key; the surviving frame is data-dependent
    * so it is NOT hint-broadcast — AQE converts the join at runtime
    * when the filtered side is small (executed-plan evidence at 100×
    * in BASELINE.md's q18 plan-audit section). Customer is likewise
    * unhinted (corpus-scaled — see [[q8MarketShare]]). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity")
      .groupBy(col("l_orderkey"))
      .agg(sumDec(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > lit(250.0))
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q15-style top supplier: per-supplier revenue over one
    * quarter (Q15's `revenue` view), then every supplier achieving
    * the maximum — the argmax-over-aggregate shape with TIES KEPT
    * (the spec's correlated max, not a LIMIT 1). Scale: the revenue
    * aggregate shuffles on the supplier key; the max is a 1-row
    * aggregate joined back as a broadcast equality filter — no
    * global sort, no second pass over lineitem (the quarter slice is
    * persisted through its two consumers). Equality on the revenue
    * doubles is safe because both sides of the comparison come from
    * the same exact-decimal sums. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_suppkey"))
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    val out = rev
      .join(broadcast(mx), col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
      .localCheckpoint()
    rev.unpersist()
    out
  }

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly k qualifying orders — the signature
    * outer-join + double-aggregation shape, where the LEFT join keeps
    * zero-order customers in the k=0 bucket (an inner join silently
    * drops them; that wrong-but-plausible variant is exactly what
    * this query exists to test against). The order-side predicate
    * stands in for Q13's o_comment NOT LIKE filter (this corpus
    * carries no comment columns). Scale: first aggregate shuffles on
    * c_custkey; the distribution aggregate's key space is bounded by
    * max-orders-per-customer, so the final global sort is over a
    * constant-sized frame. */
  def q13OrderCounts(s: SparkSession, d: String): DataFrame = {
    val ords = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(s, d).select("c_custkey")
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q19-style disjunctive predicate revenue: an OR-of-ANDs
    * over joined part attributes and lineitem quantity — the shape
    * that exercises predicate normalization (the common `p_partkey =
    * l_partkey` join key stays a hash join; the disjunction is a
    * post-join residual, with the per-branch quantity bounds NOT
    * pulled above the OR). */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val branch = (col("p_brand") === "Brand#13" &&
        col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 21.0)) ||
      (col("p_brand") === "Brand#19" &&
        col("p_size").between(10, 25) &&
        col("l_quantity").between(10.0, 30.0)) ||
      (col("p_brand") === "Brand#23" &&
        col("p_size").between(20, 35) &&
        col("l_quantity").between(20.0, 40.0))
    Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.part(s, d)
        .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_rows"))
  }

  /** ROLLUP over (order year, priority): grouping-sets surface. */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .rollup(col("o_year"), col("o_orderpriority"))
      .agg(sumDec(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("gid"))
      .orderBy(asc("gid"), asc_nulls_first("o_year"),
        asc_nulls_first("o_orderpriority"))

  /** Top-3 orders per customer — window rank (per-group top-k). */
  def qTopkPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy(asc("o_custkey"), asc("rnk"))
  }

  /** Running total of spend per customer — cumulative window. */
  def qRunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double"))
      .select("o_custkey", "o_orderkey", "running_spend")
      .orderBy(asc("o_custkey"), asc("o_orderkey"))
  }

  /** Customers with no orders — anti join (NOT EXISTS). */
  def qCustomersNoOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  /** Suppliers that shipped in 1997 — semi join (EXISTS). */
  def qActiveSuppliers(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")

  /** Exact distinct counts per market segment (join + count distinct). */
  def qSegmentDistinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")

  /** As-of join: latest order per (event.user_id = o_custkey) at or
    * before the event timestamp. Spark lacks a native as-of join; the
    * naive composition (equi-join + range filter + rank) multiplies
    * every event by all its user's earlier orders. This implementation
    * is the scalable merge formulation instead: union both inputs,
    * one sort per user key, and a running `last(ignoreNulls)` window
    * carries the most recent order forward onto each event row —
    * O(|events|+|orders|) rows, a single shuffle, no explosion.
    * Tie rule (same instant): orders sort before events (`is_order`
    * desc) so an order dated exactly at the event counts; among
    * equal-date orders the max orderkey wins — identical to the
    * oracle's `ORDER BY o_orderdate DESC, o_orderkey DESC` rank. */
  def qAsofEventOrder(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
      lit(1).as("is_order"), col("o_orderkey"), col("o_totalprice"),
      lit(null).cast("long").as("event_id"))
    val ev = Tables.events(s, d).select(
      col("user_id"), col("ts").as("t"), lit(0).as("is_order"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(asc("t"), desc("is_order"), asc_nulls_first("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("last_ord",
        last(when(col("is_order") === 1,
          struct(col("o_orderkey"), col("o_totalprice"))), true).over(w))
      .filter(col("is_order") === 0 && col("last_ord").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("last_ord.o_orderkey").as("o_orderkey"),
        col("last_ord.o_totalprice").as("o_totalprice"))
      .orderBy("event_id")
  }

  /** Banded range join: same-user event pairs within 5 minutes —
    * hash join on (user, time band) + residual filter instead of the
    * nested-loop plan a raw range predicate gets. */
  def qRangeJoinEvents(s: SparkSession, d: String): DataFrame = {
    val tolUs = 5L * 60 * 1000000
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
    val a = ev.select(col("user_id"), col("event_id").as("event_a"),
      col("ts").as("ts_a"))
    val b = ev.select(col("user_id"), col("event_id").as("event_b"),
      col("ts").as("ts_b"))
    graft.ext.RangeJoin.intervalJoin(a, b, "user_id", "ts_a", "ts_b",
      tolUs)
      .filter(col("event_a") < col("event_b"))
      .select(col("event_a"), col("event_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a")))
          .as("dt_us"))
      .orderBy("event_a", "event_b")
  }

  private val qRangeJoinEventsSql =
    """SELECT a.event_id AS event_a, b.event_id AS event_b,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.event_id < b.event_id
      |  AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000
      |ORDER BY event_a, event_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_range_join_events" -> (qRangeJoinEvents _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q14_promo_effect" -> (q14PromoEffect _),
    "q17_small_qty" -> (q17SmallQty _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q13_order_counts" -> (q13OrderCounts _),
    "q_rollup_year_priority" -> (qRollup _),
    "q_topk_per_customer" -> (qTopkPerCustomer _),
    "q_running_total" -> (qRunningTotal _),
    "q_customers_no_orders" -> (qCustomersNoOrders _),
    "q_active_suppliers" -> (qActiveSuppliers _),
    "q_segment_distinct" -> (qSegmentDistinct _),
    "q_asof_event_order" -> (qAsofEventOrder _),
  )

  val oracle: Map[String, String] = Map(
    "q_range_join_events" -> qRangeJoinEventsSql,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumDec("l_quantity")} AS sum_qty,
         |  ${sqlSumDec("l_extendedprice")} AS sum_base_price,
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${sqlAvgDec("l_quantity")} AS avg_qty,
         |  ${sqlAvgDec("l_extendedprice")} AS avg_price,
         |  ${sqlAvgDec("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate < TIMESTAMP '2000-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q6_forecast_revenue" ->
      s"""SELECT ${sqlSumDec("l_extendedprice * l_discount")} AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.03 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  round(${sqlSumDec("CASE WHEN sn.n_name = 'NATION_2' " +
             "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |    ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")},
         |    6) AS mkt_share,
         |  count(*) AS n_rows
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q14_promo_effect" ->
      s"""SELECT round(100.0 *
         |  ${sqlSumDec("CASE WHEN p_type = 'PROMO' " +
             "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")},
         |  6) AS promo_revenue,
         |  count(*) AS n_rows
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q17_small_qty" ->
      s"""WITH li AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#13'),
         |aq AS (SELECT l_partkey AS ap_key,
         |    ${sqlAvgDec("l_quantity")} AS avg_qty
         |  FROM li GROUP BY 1)
         |SELECT round(${sqlSumDec("l_extendedprice")} / 7.0, 6)
         |    AS avg_yearly,
         |  count(*) AS n_rows
         |FROM li JOIN aq ON l_partkey = ap_key
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q18_large_orders" ->
      s"""WITH bo AS (
         |  SELECT l_orderkey, ${sqlSumDec("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${sqlSumDec("l_quantity")} > 250.0)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  o_totalprice, sum_qty
         |FROM orders
         |JOIN bo ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT
         |  ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1.0 AND 21.0)
         |  OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 25
         |    AND l_quantity BETWEEN 10.0 AND 30.0)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 35
         |    AND l_quantity BETWEEN 20.0 AND 40.0)""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${sqlSumDec("l_extendedprice * (1.0 - l_discount)")}
         |      AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q13_order_counts" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_rollup_year_priority" ->
      s"""SELECT year(o_orderdate) AS o_year, o_orderpriority,
         |  ${sqlSumDec("o_totalprice")} AS sum_price,
         |  count(*) AS n_orders,
         |  CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
         |FROM orders
         |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
         |ORDER BY gid ASC, o_year ASC NULLS FIRST,
         |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey ASC, rnk ASC""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_active_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01')
        |ORDER BY s_suppkey""".stripMargin,
    "q_segment_distinct" ->
      s"""SELECT c_mktsegment,
         |  count(DISTINCT o_custkey) AS n_customers,
         |  count(*) AS n_orders,
         |  ${sqlSumDec("o_totalprice")} AS sum_price
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,
    "q_asof_event_order" ->
      """SELECT event_id, user_id, o_orderkey, o_totalprice FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |) t WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
  )
}
