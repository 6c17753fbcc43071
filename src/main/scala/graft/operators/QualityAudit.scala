package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality constraint audit over the star schema —
  * the contract-enforcement pass (dbt-test / Deequ shape) a pipeline
  * runs before promoting a snapshot: one output row per constraint
  * with the checked and violating row counts, so a CI gate is a
  * single `max(n_violations) == 0` scan of the report.
  *
  * Constraint classes covered, each with the Spark plan you'd want at
  * 100 TB:
  *  - UNIQUENESS (primary keys): one hash partial-agg per table
  *    (`count - count_distinct` via two-level groupBy), no join;
  *  - REFERENTIAL INTEGRITY (foreign keys): left-ANTI join counts —
  *    Catalyst broadcasts the dim side when it fits and AQE picks
  *    SMJ otherwise; the audit never materializes the orphan rows,
  *    only counts them;
  *  - RANGE / NULL predicates: a conditional-sum projection folded
  *    into the table's single scan (all predicates for one table run
  *    in ONE pass — `sum(case when …)` columns share the scan).
  *
  * Every metric is an exact BIGINT count → hash-stable oracle.
  */
object QualityAudit {

  private def chk(name: String, table: String,
      checked: Column, violations: Column): Column =
    struct(lit(name).as("constraint_name"), lit(table).as("table_name"),
      checked.cast("long").as("n_checked"), violations.cast("long").as("n_violations"))

  /** The audit report: constraint_name, table_name, n_checked,
    * n_violations — ordered by constraint name. */
  def audit(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val part = Tables.load(s, dir, "part")
    val ev = Tables.load(s, dir, "events")

    // uniqueness: rows minus distinct keys (0 when the PK holds)
    def unique(t: DataFrame, table: String, key: String): DataFrame =
      t.agg(chk(s"pk_unique_$key", table,
        count(lit(1)), count(lit(1)) - countDistinct(col(key))).as("c"))

    // referential integrity: children with no parent (anti-join count)
    def fk(child: DataFrame, childCol: String, parent: DataFrame,
        parentCol: String, table: String): DataFrame = {
      val orphans = child.select(col(childCol))
        .join(parent.select(col(parentCol).as(childCol)), Seq(childCol), "left_anti")
      val n = child.agg(count(lit(1)).as("n"))
      orphans.agg(count(lit(1)).as("v")).crossJoin(n)
        .select(chk(s"fk_${childCol}_exists", table, col("n"), col("v")).as("c"))
    }

    // predicate checks for one table share a single scan: all the
    // conditional sums run in one agg, then unpivot to report rows
    def preds(t: DataFrame, table: String, cs: (String, Column)*): DataFrame = {
      val aggs = cs.map { case (n, p) => sum(when(p, 0L).otherwise(1L)).as(s"v_$n") }
      t.agg(count(lit(1)).as("n"), aggs: _*)
        .select(explode(array(cs.map { case (n, _) =>
          chk(n, table, col("n"), col(s"v_$n"))
        }: _*)).as("c"))
    }

    val checks = Seq(
      unique(cust, "customer", "c_custkey"),
      unique(ord, "orders", "o_orderkey"),
      unique(part, "part", "p_partkey"),
      unique(ev, "events", "event_id"),
      fk(ord, "o_custkey", cust, "c_custkey", "orders"),
      fk(li, "l_orderkey", ord, "o_orderkey", "lineitem"),
      fk(li, "l_partkey", part, "p_partkey", "lineitem"),
      preds(li, "lineitem",
        "range_quantity_pos" -> (col("l_quantity") > 0),
        "range_price_pos" -> (col("l_extendedprice") > 0),
        "range_discount_unit" -> (col("l_discount") >= 0 && col("l_discount") <= 1),
        "notnull_returnflag" -> col("l_returnflag").isNotNull),
      preds(ev, "events",
        "notnull_ts" -> col("ts").isNotNull,
        "notnull_user" -> col("user_id").isNotNull),
      preds(cust, "customer",
        "notnull_name" -> col("c_name").isNotNull)
    )
    checks.map(_.select(col("c.*"))).reduce(_ unionByName _)
      .orderBy(col("constraint_name"), col("table_name"))
  }

  val auditOracleSql: String =
    """SELECT * FROM (
      |  SELECT 'pk_unique_c_custkey' AS constraint_name, 'customer' AS table_name,
      |         CAST(count(*) AS BIGINT) AS n_checked,
      |         CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations
      |  FROM customer
      |  UNION ALL
      |  SELECT 'pk_unique_o_orderkey', 'orders', CAST(count(*) AS BIGINT),
      |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'pk_unique_p_partkey', 'part', CAST(count(*) AS BIGINT),
      |         CAST(count(*) - count(DISTINCT p_partkey) AS BIGINT) FROM part
      |  UNION ALL
      |  SELECT 'pk_unique_event_id', 'events', CAST(count(*) AS BIGINT),
      |         CAST(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'fk_o_custkey_exists', 'orders', CAST((SELECT count(*) FROM orders) AS BIGINT),
      |         CAST(count(*) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'fk_l_orderkey_exists', 'lineitem', CAST((SELECT count(*) FROM lineitem) AS BIGINT),
      |         CAST(count(*) AS BIGINT)
      |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'fk_l_partkey_exists', 'lineitem', CAST((SELECT count(*) FROM lineitem) AS BIGINT),
      |         CAST(count(*) AS BIGINT)
      |  FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      |  UNION ALL
      |  SELECT 'range_quantity_pos', 'lineitem', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'range_price_pos', 'lineitem', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'range_discount_unit', 'lineitem', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'notnull_returnflag', 'lineitem', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN l_returnflag IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'notnull_ts', 'events', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'notnull_user', 'events', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM events
      |  UNION ALL
      |  SELECT 'notnull_name', 'customer', CAST(count(*) AS BIGINT),
      |         CAST(sum(CASE WHEN c_name IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM customer
      |) ORDER BY constraint_name, table_name""".stripMargin

  /** Join-key SKEW PROFILE — the diagnostic that sizes the mitigations
    * this library leans on at 100 TB (salting width, AQE skew-join
    * thresholds, bucketing counts): for each hot join key, the
    * power-of-two histogram of per-key row counts, plus each bucket's
    * min/max key fan-out. A planner reads the top bucket to decide
    * whether a key needs salting before the shuffle that would
    * otherwise hot-spot one task.
    *
    * Scale shape: per-key counts are ONE hash aggregation per relation
    * with map-side partials (the groupBy output is key-cardinality
    * sized); the bucket histogram is a second, 64-row aggregation.
    * Nothing is collected; no joins.
    *
    * Bucketing is an exact integer CASE ladder (floor(log2(cnt)) for
    * cnt in [1, 2^20)) rather than `floor(log2(x))` — `log(x)/log(2)`
    * lands a hair below the integer at exact powers of two in some
    * engines, and a portable oracle can't ride on which libm both
    * sides linked.
    */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    // exact floor(log2) for BIGINT counts via threshold ladder — runs
    // to 2^62 so ultra-hot keys (the very thing a 100 TB skew
    // diagnostic exists to surface) land in their true bucket instead
    // of silently collapsing into the top one; a BIGINT count is < 2^63
    // so bucket 62 is the last reachable
    def log2Bucket(cnt: Column): Column =
      (0 to 62).foldLeft(lit(-1)) { (acc, b) =>
        when(cnt >= (1L << b), lit(b)).otherwise(acc)
      }
    def profile(t: DataFrame, relation: String, key: String): DataFrame =
      t.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
        .select(lit(relation).as("relation"), log2Bucket(col("cnt")).as("bucket"),
          col("cnt"))
        .groupBy(col("relation"), col("bucket"))
        .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          min(col("cnt")).as("min_key_rows"), max(col("cnt")).as("max_key_rows"))
    profile(Tables.load(s, dir, "lineitem"), "lineitem.l_orderkey", "l_orderkey")
      .unionByName(
        profile(Tables.load(s, dir, "orders"), "orders.o_custkey", "o_custkey"))
      .unionByName(
        profile(Tables.load(s, dir, "events"), "events.user_id", "user_id"))
      .orderBy(col("relation"), col("bucket"))
  }

  /** DuckDB restatement of [[skewProfile]] — same CASE-ladder bucket. */
  def skewProfileOracleSql: String = {
    val ladder = (0 to 62).map(b => s"WHEN cnt >= ${1L << b} THEN $b")
      .reverse.mkString(" ")
    def leg(table: String, key: String): String =
      s"""SELECT '$table.$key' AS relation,
         |       CASE $ladder ELSE -1 END AS bucket,
         |       CAST(count(*) AS BIGINT) AS n_keys,
         |       CAST(sum(cnt) AS BIGINT) AS n_rows,
         |       CAST(min(cnt) AS BIGINT) AS min_key_rows,
         |       CAST(max(cnt) AS BIGINT) AS max_key_rows
         |FROM (SELECT $key, count(*) AS cnt FROM $table GROUP BY $key)
         |GROUP BY 1, 2""".stripMargin
    s"""SELECT * FROM (
       |${leg("lineitem", "l_orderkey")}
       |UNION ALL
       |${leg("orders", "o_custkey")}
       |UNION ALL
       |${leg("events", "user_id")}
       |) ORDER BY relation, bucket""".stripMargin
  }
}
