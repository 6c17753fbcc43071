package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series / event-stream queries over the `events` table —
  * batch-windowed forms (SURVEY §7.6); the Structured Streaming
  * variants of the same aggregations live in
  * [[graft.streaming.EventStream]] and are asserted equivalent in
  * StreamingSpec.
  *
  * Windows are expressed as (date, hour) grouping keys rather than
  * Spark's `window()` struct so the DuckDB oracle can reproduce them
  * exactly (and because a struct column can't be hash-compared by the
  * driver). Semantically identical tumbling windows.
  */
object EventsQueries {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** Tumbling 1-hour window counts/sums per event type. */
  def hourlyCounts(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).cast("long").as("event_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_date"), col("event_hour"), col("event_type"))

  /** Tumbling 1-day window with distinct users. */
  def dailyActivity(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (round(sum(col("value")), 2) / count(lit(1))).as("avg_value"))
      .orderBy(col("event_date"), col("event_type"))

  /** Sessionization: a session break is a >30-minute gap between a
    * user's consecutive events (lag window); sessions per user =
    * 1 + breaks.
    */
  def sessionCounts(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    ev(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_break",
        when(col("prev_ts").isNull, 0)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg((sum(col("is_break")) + 1).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Top-5 users per event type by total value (rank window over an
    * aggregate; rank computed on the rounded sum so it is deterministic
    * across engines).
    */
  def topUsers(s: SparkSession, dir: String): DataFrame = {
    val totals = ev(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 2).as("total_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("total_value").desc, col("user_id").asc)
    totals.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("event_type"), col("rnk").cast("long").as("rnk"), col("user_id"), col("total_value"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** Ordered conversion funnel view → click → purchase: per stage, the
    * distinct users who completed it IN ORDER (a click only counts
    * after the user's first view; a purchase only after that click).
    * Three per-user min-aggregates chained by inner joins — each stage
    * shrinks the user set, so the joins get cheaper down the funnel;
    * everything shuffles on user_id once per stage with map-side
    * partials (no window, no ordering of raw events needed).
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    v.select(lit(1L).as("stage"), lit("view").as("stage_name"), col("user_id"))
      .union(c.select(lit(2L), lit("click_after_view"), col("user_id")))
      .union(p.select(lit(3L), lit("purchase_after_click"), col("user_id")))
      .groupBy(col("stage"), col("stage_name"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Cohort retention: users grouped by first-seen date, counted on
    * each later active day as (cohort_date, day_offset) — the
    * "day-N retention" triangle. Two aggregates and one join on
    * user_id; the distinct (user, day) reduction happens BEFORE the
    * join so the join input is bounded by users × active-days, not
    * raw events.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val active = e.select(col("user_id"), to_date(col("ts")).as("active_date")).distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_date"),
        datediff(col("active_date"), col("cohort_date")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_date"), col("day_offset"))
  }

  /** Equi-width histogram of `value` (width 25): pure arithmetic
    * binning — one aggregate, no sort of the data, bins ordered at the
    * end (bin count, not row count). The IEEE double division is
    * bit-identical across engines, so the bucket boundaries are exact.
    */
  def valueHistogram(s: SparkSession, dir: String, width: Double = 25.0): DataFrame =
    ev(s, dir)
      .groupBy(floor(col("value") / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .withColumn("bin_lo", (col("bin") * width).cast("double"))
      .select(col("bin"), col("bin_lo"), col("n_events"), col("sum_value"))
      .orderBy(col("bin"))

  /** JSON property extraction from the `props` column (semi-structured
    * payload — `get_json_object` is the codegen'd path).
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

  /** SCD-2 style state history: treat each user's event stream as a
    * slowly-changing dimension where `event_type` is the state, and
    * emit one validity interval per state CHANGE — `valid_from` =
    * first event of the run, `valid_to` = the next change (null while
    * current). Consecutive equal states collapse into one interval
    * (gaps-and-islands: run boundaries found by comparing against
    * `lag`, runs numbered by a running sum of boundaries).
    *
    * ONE shuffle total: every window — boundary lag, run counter, row
    * position, per-user count, and the post-filter lead over interval
    * STARTS — partitions by `user_id`, so Catalyst plans a single
    * hash Exchange and the filter/lead reuse it (asserted in
    * Round8Spec). A groupBy(user_id, run_id) formulation would
    * re-shuffle on the compound key; counting events per run as
    * `next_start_position − start_position` keeps everything on the
    * original partitioning.
    *
    * Timestamps are emitted as epoch milliseconds (BIGINT) so the
    * driver hash-compare is binary-stable across engines' timestamp
    * renderings; both Spark (µs precision) and DuckDB (ns) floor to
    * the same ms for any sub-ms component.
    */
  def scd2States(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val byUser = Window.partitionBy(col("user_id"))
    val rows = ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTs).isNull ||
          lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(byTs).cast("long"))
      .withColumn("n_user", count(lit(1)).over(byUser))
    val starts = rows.filter(col("chg") === 1L)
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("rn").asc)
    starts
      .withColumn("n_events",
        coalesce(lead(col("rn"), 1).over(byRun), col("n_user") + 1L) - col("rn"))
      .withColumn("valid_from", unix_millis(col("ts")))
      .withColumn("valid_to", unix_millis(lead(col("ts"), 1).over(byRun)))
      .select(col("user_id"), col("run_id"), col("event_type").as("state"),
        col("n_events"), col("valid_from"), col("valid_to"))
      .orderBy(col("user_id"), col("run_id"))
  }

  /** Gap-filled hourly event rates: every hour in the observed span
    * appears, zero-count hours included — the calendar densification a
    * monitoring dashboard needs (a missing-hours gap is exactly the
    * signal a sparse GROUP BY silently hides). The hour dimension is
    * GENERATED (`sequence` over the observed min/max, exploded), then
    * the sparse counts left-join onto it.
    *
    * Scale shape: the span's hour table is tiny (years ≈ 10⁴ rows) and
    * generated from a one-row min/max aggregate; the only corpus-sized
    * work is the hourly count aggregate the sparse report already
    * paid. Emitted as (date, hour) scalar keys for the oracle hash.
    */
  def hourlyRateGapFilled(s: SparkSession, dir: String): DataFrame =
    hourlyRateGapFilledOn(ev(s, dir))

  /** Frame-level form of [[hourlyRateGapFilled]] (planted-gap specs). */
  def hourlyRateGapFilledOn(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"))
    val span = events
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
    val hours = span
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("h"))
    hours.join(counts, Seq("h"), "left")
      .select(to_date(col("h")).as("event_date"),
        hour(col("h")).cast("long").as("event_hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("event_date"), col("event_hour"))
  }

  /** Tukey-fence outlier screen per event type: interquartile fences
    * `[q1 − 1.5·IQR, q3 + 1.5·IQR]` and the count/extremes of values
    * outside them — the standard distribution-free anomaly screen for
    * a metrics stream. Fences are chosen over z-scores deliberately:
    * quantiles are order statistics (exact interpolation of two
    * sorted values — no cross-row float summation), so the fence
    * values and therefore the outlier COUNTS are bit-deterministic
    * cross-engine, where a mean/stddev fence could flip boundary rows
    * on summation-order ulps.
    *
    * Scale note: exact per-group percentiles sort each group — the
    * audit/screen form. At 100 TB the same fences come from the
    * mergeable histogram partials ([[TrainingPrep.histogramRollup]])
    * at one bucket-width resolution, raw data untouched.
    */
  def valueOutliers(s: SparkSession, dir: String): DataFrame = {
    val r4 = graft.functions.Rounding.portableRound4 _
    val fences = ev(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    ev(s, dir)
      .join(broadcast(fences), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        r4(max(col("q1"))).as("q1"), r4(max(col("q3"))).as("q3"),
        r4(max(col("lo"))).as("lo_fence"), r4(max(col("hi"))).as("hi_fence"),
        sum((col("value") < col("lo") || col("value") > col("hi"))
          .cast("long")).as("n_outliers"),
        r4(max(when(col("value") > col("hi"), col("value")))).as("max_outlier"))
      .orderBy(col("event_type"))
  }

  /** Sequence training examples — next-event-prediction pairs built
    * from each user's event history: for every event after a user's
    * first, emit (context = up to `ctx` preceding event types, target
    * = this event's type). This is the "behavioral LM" dataset
    * construction a recommender / sequence-model pipeline runs over
    * its event log.
    *
    * Scale shape: everything is windowed PER USER (partition count =
    * users, each bounded by that user's history — the same partition
    * discipline sessionize/SCD-2 use; no global window). `lag` over
    * the (ts, event_id)-ordered stream is deterministic under
    * timestamp ties, and `concat_ws` skips the nulls of the first
    * `ctx` rows, so early events emit shorter contexts rather than
    * placeholder tokens — in both engines, by the same rule.
    */
  def seqExamples(s: SparkSession, dir: String, ctx: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("context", concat_ws(" ",
        (ctx to 1 by -1).map(i => lag(col("event_type"), i).over(w)): _*))
      .filter(col("pos") >= 2)
      .select(col("user_id"), col("pos"), col("context"),
        col("event_type").as("target"))
      .orderBy(col("user_id"), col("pos"))
  }

  /** Time-decayed per-user engagement: each event's value weighted by
    * 2^(-age_days) relative to the newest event in the table (half-life
    * = 1 day), the freshness weighting a recommender / data-mixture
    * pipeline applies before sampling.
    *
    * EXACT-ARITHMETIC DESIGN (the [[Graphs]] fixed-point discipline):
    * the value is carried as integer cents and the dyadic decay is an
    * integer RIGHT SHIFT — `cents >> age` == `cents div 2^age` for
    * non-negative cents — so every term, and therefore the sum, is
    * associative BIGINT math: bit-identical in any engine, no float
    * summation order to round away. Ages clamp at 50 days (the weight
    * is 0 cents long before that; the clamp keeps the shift far from
    * the 63-bit wrap both engines would differ on). Negative values
    * (absent from this table, asserted by [[QualityAudit]]-style
    * `n_neg`) would floor toward -inf in both engines identically via
    * arithmetic shift.
    *
    * Scale: one scan, one broadcast of the 1-row max-date agg, one
    * partial-agg groupBy on user_id. Nothing else.
    */
  def timeDecayedValue(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val maxDay = e.agg(max(to_date(col("ts"))).as("max_day"))
    e.crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        least(datediff(col("max_day"), to_date(col("ts"))), lit(50)).as("age"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("shiftright(cents, age)")).as("decayed_cents"),
        sum(col("cents")).as("total_cents"))
      .orderBy(col("user_id"))
  }

  val timeDecayedValueOracleSql: String =
    """WITH m AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
      |e AS (
      |  SELECT user_id,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |         least(date_diff('day', CAST(ts AS DATE), m.max_day), 50) AS age
      |  FROM events, m
      |)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(cents >> age) AS BIGINT) AS decayed_cents,
      |       CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin
}
