package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational query surface over the star schema — the extension the
  * reference lacks entirely (SURVEY §2.2: joins, windows, set ops,
  * grouping are all absent from the C engine).
  *
  * Scale notes (100 TB posture):
  *  - Dimension tables (`region`/`nation`/`customer`/`supplier`/`part`)
  *    stay small relative to the facts at any scale factor — every
  *    fact⋈dim join below is explicitly `broadcast()` so the fact table
  *    never shuffles for a dimension lookup.
  *  - `lineitem ⋈ orders` is fact⋈fact: a shuffled hash/sort-merge join
  *    on the key both sides are already bucketable on; AQE picks the
  *    strategy and handles skew at runtime.
  *  - Aggregates are declarative `groupBy().agg()` ⇒ Catalyst plans
  *    partial (map-side) + final aggregation automatically.
  *  - Double-typed aggregates are `round(…, 2)` so results are stable
  *    across summation orders (oracle parity).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H Q1-style pricing summary (group-agg over the biggest fact). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        // avg = rounded-sum / count with NO outer round: identical
        // doubles divide identically in IEEE, while re-rounding the
        // quotient hits half-way cases where engines' rounding rules
        // differ (e.g. 307.03/8 = 38.37875)
        (round(sum(col("l_quantity")), 2) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Filter + projection — exists to prove predicate pushdown + column
    * pruning reach the parquet scan (asserted in RelationalSpec).
    */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 49 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Revenue per region/nation — the 5-way star join
    * (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region).
    */
  def starRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-3 orders per market segment — rank window. */
  def topOrdersPerSegment(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("c_mktsegment"), col("rnk").cast("long").as("rnk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  /** Customers with no orders — anti join (NOT EXISTS). */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Customers having a big order — semi join (EXISTS). */
  def bigSpenders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Set ops: customers with both open ('O') and finished ('F') orders,
    * minus customers with a pending ('P') order — INTERSECT + EXCEPT.
    */
  def setOpsCustkeys(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def keys(status: String) =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey"))
    keys("O").intersect(keys("F")).except(keys("P"))
      .orderBy(col("o_custkey"))
  }

  /** Revenue ROLLUP over (region, nation) — hierarchical totals.
    * Grouping-null keys are rewritten to 'ALL' via `grouping()` so the
    * output carries no NULL group keys (oracle-safe and clearer).
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        // grouping() is only resolvable inside the Aggregate node
        when(grouping(col("r_name")) === 1, "ALL").otherwise(col("r_name")).as("region"),
        when(grouping(col("n_name")) === 1, "ALL").otherwise(col("n_name")).as("nation"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .select(col("region"), col("nation"), col("revenue"), col("n_lines"))
      .orderBy(col("region"), col("nation"))
  }

  /** CUBE over order status × priority. */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        when(grouping(col("o_orderstatus")) === 1, "ALL").otherwise(col("o_orderstatus")).as("status"),
        when(grouping(col("o_orderpriority")) === 1, "ALL").otherwise(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .select(col("status"), col("priority"), col("n_orders"), col("total_price"))
      .orderBy(col("status"), col("priority"))

  /** Approximate distinct cardinalities (HLL) next to exact — the
    * sketch path for 100 TB cardinality estimation. Not oracle-checked
    * (HLL implementations differ across engines); accuracy asserted in
    * QueriesSpec instead.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    // Exact count(DISTINCT) mixed with HLL sketches in ONE Aggregate
    // forces an Expand-based multi-distinct plan that re-evaluates the
    // HLL update per expanded row — measured 10x slower than running
    // the two aggregations separately and joining on the group key.
    val li = t(s, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
    val exact = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_orderkey")).as("exact_orders"))
    approx.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_orders"),
        col("exact_orders"), col("approx_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** Multi-stat aggregate per order status. */
  def orderStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        (round(sum(col("o_totalprice")), 2) / count(lit(1))).as("avg_price"))
      .orderBy(col("o_orderstatus"))
}
