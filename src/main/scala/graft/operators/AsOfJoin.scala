package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of join: attach to each left row the most recent right row with
  * `right.ts <= left.ts` within the same key — the standard
  * event/feature temporal join Spark has no built-in operator for.
  *
  * Implementation follows the preference order in SURVEY §4.3 /
  * the Spark guide: COMPOSE built-ins before writing a custom
  * `SparkStrategy`. The composition is the union-sort trick:
  * tag both sides, union, and take `last_value(ignoreNulls)` of the
  * right payload over a (key, time) window — one shuffle on the key,
  * Spark's external sort within partitions, no range explosion.
  * Equal timestamps resolve right-before-left (side tag is the tie
  * break), matching ASOF semantics with `>=`.
  *
  * Scale: cost is exactly one hash partition by key + per-partition
  * sort — the same shape as any windowed aggregation; skewed keys are
  * handled by AQE the same way. This beats a range-join (explodes
  * candidate pairs) and a per-key `collect_list` (unbounded state).
  */
object AsOfJoin {

  /** Generic form: left/right must share `keyCol` and `tsCol`;
    * `payload` names the right-side column to carry (aliased
    * `asof_<payload>` in the output).
    */
  def asOf(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, payload: String): DataFrame = {
    // A NULL payload on the matched right row must be representable:
    // box the payload in a single-field struct, which is non-null on
    // every right row even when the payload itself is NULL. Then
    // last(ignoreNulls) skips only LEFT rows (whose struct is NULL) —
    // never a matched right row — so a NULL payload on the true match
    // surfaces as NULL instead of falling back to an older value.
    val rTag = right.select(col(keyCol), col(tsCol),
        struct(col(payload).as("v")).as("_p")).withColumn("_src", lit(0))
    val lTag = left.withColumn("_src", lit(1))
      .withColumn("_p", lit(null).cast(rTag.schema("_p").dataType))
    val unioned = lTag.columns.foldLeft(rTag) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(lTag.schema(c).dataType))
    }.select(lTag.columns.toIndexedSeq.map(col): _*).union(lTag)

    // _p as the final sort key: two right rows sharing (key, ts) would
    // otherwise resolve by partition-sort luck, violating the engine's
    // parallelism-independence requirement (ties pick the max payload;
    // struct asc compares the wrapped value, NULL field first)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_src").asc, col("_p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)
      .withColumn(s"asof_$payload", col("_m").getField("v"))
      .drop("_src", "_p", "_m")
  }

  /** Q-ASOF: each purchase event annotated with the user's most recent
    * click value at-or-before the purchase (the feature-at-event-time
    * lookup of a training pipeline).
    */
  def purchasesWithLastClick(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // duplicate-(user_id, ts) clicks: asOf's window tie-break (_p asc,
    // last) already picks the MAX value deterministically; the DuckDB
    // oracle picks an ARBITRARY row on ties, so the ORACLE side
    // pre-aggregates to max(value) per (user_id, ts) — same semantics,
    // no extra shuffle here. NULL click values stay in: the boxed-
    // struct asOf carries a NULL payload on the true match (= DuckDB
    // ASOF), and max() per tie-group returns NULL only when the whole
    // group is NULL, matching the struct-asc tie-break.
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    // raw doubles pass through unrounded: round() on a stored double is
    // NOT engine-portable (Spark rounds the shortest decimal repr,
    // DuckDB the binary value — they disagree on x.xx5-adjacent values)
    asOf(purchases, clicks, "user_id", "ts", "click_value")
      .select(col("event_id"), col("user_id"),
        col("value").as("purchase_value"),
        col("asof_click_value").as("last_click_value"))
      .orderBy(col("event_id"))
  }

  /** Range-predicate join: lineitems shipped more than 90 days after
    * their order date (equi key + range condition in one join).
    */
  def lateShipments(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_late_lines"),
        countDistinct(col("o_orderkey")).as("n_late_orders"))
      .orderBy(col("o_orderstatus"))
  }
}
