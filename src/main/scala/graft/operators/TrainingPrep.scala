package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-run preparation operators: deterministic global shuffle +
  * shard assignment, vocabulary construction with token-id encoding,
  * and incremental rollup-from-partials aggregation.
  *
  * All three are the shapes a 100 TB pipeline leans on right before
  * and during training:
  *  - a reproducible global data order that is embarrassingly parallel
  *    to WRITE (no global sort — each shard sorts independently);
  *  - a frequency-ranked vocabulary plus the id-encoding pass
  *    (broadcast dictionary join, never a shuffle of the corpus);
  *  - pre-aggregated partials that answer coarser rollups without ever
  *    re-scanning raw data (the algebraic-aggregate maintenance
  *    pattern: sum/count/min/max compose, avg = sum/count at the end).
  */
object TrainingPrep {

  /** Deterministic global training shuffle + sharding.
    *
    * Order key is a multiplicative-congruential hash of `doc_id`
    * (Knuth constant 2654435761, LCG increment 1013904223, mod 2^31)
    * computed in plain BIGINT arithmetic — bit-identical in any SQL
    * engine, no engine hash builtin involved, and overflow-safe for
    * doc_id up to ~3.4e9 (product < 2^63). Shard = h mod nShards,
    * position = rank of h within the shard.
    *
    * Scale shape: the window partitions by `shard_id`, so each shard's
    * order is produced independently — one task per shard, no global
    * sort. At 100 TB this is a bucketed write (`bucketBy(shard)` +
    * `sortBy(h)`); a single global ORDER BY would funnel the corpus
    * through one range-partitioned sort instead.
    */
  def shardOrder(s: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val h = (col("doc_id") * lit(2654435761L) + lit(1013904223L)) % lit(2147483648L)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard_id", col("h") % nShards)
      .withColumn("position",
        row_number().over(
          Window.partitionBy(col("shard_id")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
      .select(col("shard_id"), col("position"), col("doc_id"), col("h"))
      .orderBy(col("shard_id"), col("position"))
  }

  /** Frequency-ranked vocabulary over lowercased whitespace tokens:
    * token_id = rank by (count DESC, token ASC) — fully deterministic —
    * truncated to `vocabSize`. One corpus scan + one hash aggregation.
    *
    * The truncation is `orderBy(...).limit(n)` — Spark plans that as
    * `TakeOrderedAndProject` (per-partition top-n, merged), so the
    * distinct-token table is never globally sorted through one
    * partition; the ranking window then runs over only `vocabSize`
    * rows. (A bare global row_number window here would funnel every
    * distinct token — billions at web scale — through a single task.)
    */
  def vocabulary(s: SparkSession, dir: String, vocabSize: Int = 256): DataFrame = {
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.load(s, dir, "documents")
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(vocabSize)
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("n").desc, col("token").asc))
          .cast("long"))
      .select(col("token_id"), col("token"), col("n"))
  }

  /** Encode each document's first `maxTokens` tokens as vocabulary ids
    * (out-of-vocabulary → 0). Documents with no tokens are dropped (the
    * oracle-stable choice: a zipped unnest of an empty list yields no
    * rows).
    *
    * Scale shape: the vocabulary is small by construction (`vocabSize`
    * rows) and broadcast, so the encoding pass is a narrow map over the
    * corpus — posexplode, broadcast-hash lookup, re-assemble ordered by
    * position. The corpus is never shuffled; the single `groupBy
    * (doc_id)` re-assembly rides the scan partitioning with map-side
    * partial aggregation. The global-window vocabulary ranking is a
    * driver-size sort (distinct tokens after the count aggregation),
    * not a corpus sort.
    */
  def vocabEncode(s: SparkSession, dir: String,
      vocabSize: Int = 256, maxTokens: Int = 12): DataFrame = {
    val vocab = vocabulary(s, dir, vocabSize)
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), slice(toks, 1, maxTokens).as("head"),
        size(toks).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), posexplode(col("head")))
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        col("col") === col("token"), "left")
      .groupBy(col("doc_id"), col("n_tokens"))
      // token_ids is emitted as a space-joined STRING, not array<long>:
      // every gate-visible output column must be scalar so any harness
      // (pandas sort_values, hash-of-values) can canonicalize rows.
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), coalesce(col("token_id"), lit(0L)).as("id")))),
        e => e.getField("id").cast("string"))).as("token_ids"))
      .select(col("doc_id"), col("n_tokens"), col("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** Daily algebraic partials over events: the persisted increment a
    * pipeline maintains per ingest day. count/sum/min/max only — every
    * column here composes under re-aggregation.
    */
  def dailyPartials(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Approximate-distinct rollup from persisted sketches — the
    * non-algebraic sibling of [[weeklyRollup]]: exact COUNT(DISTINCT)
    * does not compose across partials, but HLL sketches do. Each day
    * keeps an `hll_sketch_agg(user_id)` binary; any coarser rollup
    * unions the sketches (`hll_union_agg`) and estimates — raw events
    * are never re-scanned and the partial table stays metadata-scale
    * (days × types × ~1.5 KB sketch).
    *
    * At 100 TB this is how "distinct users per week/month/all-time"
    * stays a metadata query. Rows-only entry (sketch estimates are
    * engine-specific); SketchSpec asserts the estimate against the
    * exact distinct count.
    */
  def hllRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(weekofyear(col("event_date")).cast("long").as("week"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy(col("week"), col("event_type"))
  }

  /** The exact companion of [[hllRollup]]: weekly distinct users
    * computed directly from raw events with COUNT(DISTINCT). Not the
    * scale path (exact distinct doesn't compose from partials — that
    * is the entire reason the sketch rollup exists) but it IS
    * SQL-expressible, so it gets a full DuckDB oracle row. Shipping
    * both makes the sketch's ≤5% error bound gate-visible data: the
    * estimate (`q_hll_rollup`, rows-only by necessity) can be checked
    * against this hash-verified exact row for every (week, type)
    * group, instead of living only inside a spec assertion.
    */
  def hllRollupExact(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(weekofyear(to_date(col("ts"))).cast("long").as("week"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("week"), col("event_type"))

  /** Weekly rollup computed ONLY from the daily partials — raw events
    * are never re-scanned. sum-of-counts, sum-of-sums, min-of-mins,
    * max-of-maxes; avg derived as merged-sum / merged-count at the end
    * (the one non-algebraic aggregate, recovered from its algebraic
    * parts).
    *
    * This is the 100 TB aggregation-maintenance pattern: the daily
    * table is O(days × types) — metadata-scale — so week/month/all-time
    * rollups cost nothing regardless of raw volume. The oracle computes
    * the same answer directly from raw events, proving the partial
    * merge is exact.
    */
  def weeklyRollup(s: SparkSession, dir: String): DataFrame =
    dailyPartials(s, dir)
      .groupBy(weekofyear(col("event_date")).cast("long").as("week"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        round(sum(col("sum_value")), 2).as("sum_value"),
        // min/max are order-independent EXACT doubles — no rounding
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"),
        // avg from the ROUNDED merged sum: the raw partial-merged sum
        // differs from a direct sum by ulps, which can flip the
        // 4-decimal rounding on an exact .5 quotient boundary (seen at
        // sf0.001: 2409.18/48 = 50.19125). Dividing the 2-decimal
        // rounded sum gives both engines bit-identical inputs.
        graft.functions.Rounding.portableRound4(
          round(sum(col("sum_value")), 2) / sum(col("n_events"))).as("avg_value"))
      .orderBy(col("week"), col("event_type"))

  /** Histogram contract shared by the batch rollup and the streaming
    * maintenance: 128 buckets of width 5.0 over the declared [0, 640)
    * domain, out-of-range clamped to the edge buckets.
    */
  private val HistWidth = 5.0
  private val HistBuckets = 128

  /** Daily fixed-boundary bucket counts — the PERSISTED mergeable
    * partial. Counts add, so any batch of raw events (a day, a
    * micro-batch, a backfill) contributes independently.
    */
  def dailyHistogram(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("event_date"), col("event_type"),
        least(lit(HistBuckets - 1),
          greatest(lit(0), floor(col("value") / HistWidth))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Weekly percentile walk over (event_date, event_type, bucket, cnt)
    * partials — the metadata-scale half of [[histogramRollup]], also
    * the serving query over a STREAMING-maintained partial table.
    */
  def histogramPercentiles(daily: DataFrame): DataFrame = {
    val width = HistWidth
    val weekly = daily
      .groupBy(weekofyear(col("event_date")).cast("long").as("week"),
        col("event_type"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val byGroup = Window.partitionBy(col("week"), col("event_type"))
    val cum = weekly
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(
          byGroup.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(byGroup))
    // the single bucket whose cumulative range spans p·total carries
    // the estimate; every other row contributes null, so max() selects
    // it without a second pass
    def est(p: Double): Column = {
      val target = lit(p) * col("total")
      max(when(col("cum_before") < target && target <= col("cum_before") + col("cnt"),
        graft.functions.Rounding.portableRound4(
          col("bucket") * lit(width) +
            lit(width) * (target - col("cum_before")) / col("cnt"))))
    }
    cum.groupBy(col("week"), col("event_type"))
      .agg(max(col("total")).as("n_events"),
        est(0.5).as("h_p50"), est(0.9).as("h_p90"), est(0.99).as("h_p99"))
      .orderBy(col("week"), col("event_type"))
  }

  /** Percentiles from MERGEABLE histogram partials — the quantile
    * sibling of [[hllRollup]]: exact percentiles do not compose
    * across partials, but fixed-boundary histogram counts do (counts
    * add). Each day keeps (event_type, bucket, cnt) over a DECLARED
    * value domain — [0, 640) in 128 × 5.0-wide buckets, out-of-range
    * values clamped to the edge buckets, the same contract
    * fixed-range production sketches (HDR-style histograms) use. A
    * weekly percentile is then: merge counts, walk the cumulative
    * distribution to the bucket where it crosses p·total, and
    * linear-interpolate inside that bucket.
    *
    * Unlike the HLL estimate, this arithmetic is fully deterministic
    * — both engines compute the identical double — so the sketch
    * query itself gets a HASH-checked oracle row, not a rows-only
    * entry; the estimate-vs-exact error bound (≤ one bucket width by
    * construction: the true p-th value lies in the selected bucket)
    * is additionally spec-asserted.
    *
    * Scale shape: the daily partial table is O(days × types × 128) —
    * metadata-scale — and the weekly walk's window runs over ≤128
    * bucket rows per (week, type) partition, so the whole rollup
    * never re-touches raw events. This is how "p99 latency per
    * week/month/all-time" stays a metadata query at 100 TB.
    */
  def histogramRollup(s: SparkSession, dir: String): DataFrame =
    histogramPercentiles(dailyHistogram(Tables.load(s, dir, "events")))
}
